"""Sharded evaluation: jitted normalise + argmax + confusion over the mesh.

The reference pulls per-batch argmax to the host and accumulates NumPy I/U per
sample (reference: train_seg_semisup_mask_mt.py:484-517). Here ONE jitted
program per eval batch normalises the raw uint8 canvases, runs the forward,
and computes the batch confusion matrix on device (one scatter-add); with the
batch sharded over the data mesh axis XLA splits the forward across chips and
psum-reduces the (C, C) matrix, so a single small matrix crosses to the host
per batch. Padded pixels use the ignore value, so bucketed padding at eval
time does not perturb the metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cutmix_seg_tpu.aug.device import normalise
from cutmix_seg_tpu.ops.iou import confusion_matrix
from cutmix_seg_tpu.semisup.mask_mt import apply_model
from cutmix_seg_tpu.utils.fn_cache import FnCache, stable_ident


def normalise_eval_batch(batch, mean, std):
    """Normalise a raw eval batch inside jit (no geometry at eval time).

    batch: {'canvas': (N,H,W,3) uint8 images at the canvas origin,
    'labels': (N,H,W) integer (255-filled beyond the true extent),
    'sizes': (N,2) int true (h,w)}. Equivalent to the identity-matrix warp of
    aug.device.augment_batch (bilinear taps at exact integer coordinates with
    full coverage inside the extent) without the gathers: the valid mask is
    computed directly from the extents and the alpha-trick standardisation
    applied (reference: seg_transforms_cv.py:598-610).
    """
    canvas = batch["canvas"]
    sizes = batch["sizes"]
    n, h, w = canvas.shape[:3]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)[None]
    valid = (
        (ys < sizes[:, 0, None, None]) & (xs < sizes[:, 1, None, None])
    ).astype(jnp.float32)[..., None]
    x = normalise(canvas.astype(jnp.float32), valid, mean, std)
    y = batch["labels"].astype(jnp.int32)
    return x, y, valid


_sharded_cache = FnCache(max_size=8)


def make_sharded_eval_fn(model, num_classes, mean, std, mesh,
                         ignore_value: int = 255):
    """(model_state, raw_batch) -> replicated (C, C) int32 confusion matrix,
    jitted over ``mesh`` with the batch sharded on 'data'. Compiled programs
    are cached per (model, mesh, classes, stats) so per-epoch calls reuse
    them."""
    from cutmix_seg_tpu.parallel.mesh import jit_sharded_eval

    key = ("cm", stable_ident(model), stable_ident(mesh), num_classes, ignore_value,
           tuple(jnp.asarray(mean).tolist()), tuple(jnp.asarray(std).tolist()))

    def build():
        def eval_fn(model_state, batch):
            x, y, _ = normalise_eval_batch(batch, mean, std)
            logits, _ = apply_model(
                model, model_state.params, model_state.batch_stats, x,
                train=False, freeze_bn=True)
            pred = jnp.argmax(logits, axis=-1)
            return confusion_matrix(pred, y, num_classes, ignore_value)

        return jit_sharded_eval(eval_fn, mesh)

    return _sharded_cache.get_or_build(key, build)


def make_sharded_predict_fn(model, mean, std, mesh):
    """(model_state, raw_batch) -> (pred (N,H,W) int32, y (N,H,W) int32),
    jitted over ``mesh`` with the batch sharded on 'data' and the outputs
    REPLICATED: the callers (ISIC hole filling, prediction PNG export) fetch
    per-sample arrays on the host, and in multi-host runs a data-sharded
    output would span non-addressable devices and be unfetchable — the
    all-gather of int32 argmaxes is cheap next to the forward."""
    from cutmix_seg_tpu.parallel.mesh import batch_sharding, replicated

    key = ("pred", stable_ident(model), stable_ident(mesh),
           tuple(jnp.asarray(mean).tolist()), tuple(jnp.asarray(std).tolist()))

    def build():
        def raw(model_state, batch):
            x, y, _ = normalise_eval_batch(batch, mean, std)
            logits, _ = apply_model(
                model, model_state.params, model_state.batch_stats, x,
                train=False, freeze_bn=True)
            return jnp.argmax(logits, axis=-1), y

        repl = replicated(mesh)
        data = batch_sharding(mesh)
        return jax.jit(raw, in_shardings=(repl, data),
                       out_shardings=(repl, repl))

    return _sharded_cache.get_or_build(key, build)


def make_eval_cm_fn(model, num_classes: int, ignore_value: int = 255,
                    jit: bool = True):
    """Returns eval_fn(model_state, batch) -> (C, C) int32 confusion matrix.

    batch: {'x': (N,H,W,3) normalised images, 'y': (N,H,W) int labels}.
    jit=True compiles the whole forward+confusion program (pass False when
    wrapping with a sharded jit yourself, e.g. parallel.mesh.jit_sharded_eval).
    """

    def eval_fn(model_state, batch):
        logits, _ = apply_model(
            model, model_state.params, model_state.batch_stats, batch["x"],
            train=False, freeze_bn=True,
        )
        pred = jnp.argmax(logits, axis=-1)
        return confusion_matrix(pred, batch["y"], num_classes, ignore_value)

    return jax.jit(eval_fn) if jit else eval_fn


_predict_cache = {}


def predict_fn(model, model_state, x):
    """Jitted argmax prediction (compiled once per model object)."""
    f = _predict_cache.get(stable_ident(model))
    if f is None:
        def raw(params, batch_stats, x):
            logits, _ = apply_model(model, params, batch_stats, x,
                                    train=False, freeze_bn=True)
            return jnp.argmax(logits, axis=-1)

        f = jax.jit(raw)
        _predict_cache[stable_ident(model)] = f
    return f(model_state.params, model_state.batch_stats, x)
