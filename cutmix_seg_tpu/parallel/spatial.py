"""Spatial partitioning: shard the image H axis over the mesh for
high-resolution inference and evaluation.

The reference evaluates full-resolution images one batch at a time on a single
GPU (reference: train_seg_semisup_mask_mt.py:484-517) — resolution is capped
by one device's memory and latency by one device's FLOPs. On a TPU mesh the
idiomatic alternative for *large images at small batch* is to partition the
image spatially: NHWC activations sharded on H across the 'data' axis, with
XLA GSPMD inserting halo exchanges for the convolutions/pools and collectives
for the bilinear-resize einsums. Nothing in the model code changes — the
sharding annotations on the jit boundary are the whole mechanism (SURVEY.md §5
names spatial partitioning as the spatial analogue of sequence parallelism
for this workload).

When to use which axis mapping:
  * batch-parallel (parallel.mesh.jit_sharded_eval): batch >= n_devices —
    best throughput, zero cross-chip activation traffic.
  * spatial (this module): batch < n_devices or a single image too large /
    too slow for one chip (e.g. Cityscapes 1024x2048, or the x4 original
    resolution the converter downsamples from) — best single-image latency
    and per-chip activation memory ~ 1/n.

Halo cost intuition: at output-stride 8 a 1024-row image has 128 feature
rows; split 8 ways each shard holds 16 rows and the deepest dilated-4 3x3
convs exchange 4-row halos — ~25% activation overlap at the deepest layer,
far less higher up. The exchanges ride ICI as ppermute pairs inserted by
GSPMD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cutmix_seg_tpu.eval.evaluator import normalise_eval_batch
from cutmix_seg_tpu.ops.iou import confusion_matrix
from cutmix_seg_tpu.semisup.stepcore import apply_model
from cutmix_seg_tpu.utils.fn_cache import FnCache, stable_ident

__all__ = [
    "spatial_spec",
    "spatial_sharding",
    "spatial_h_axis_size",
    "spatial_batch_axis_size",
    "pad_batch_h",
    "jit_spatial_forward",
    "jit_spatial_step",
    "make_spatial_predict_fn",
    "make_spatial_eval_fn",
]


def spatial_spec(mesh) -> P:
    """NHWC partition spec for spatial mode on this mesh.

    1-D mesh (n_model == 1): H sharded over 'data' — every chip cooperates on
    each image. 2-D mesh (n_model > 1): batch over 'data' AND H over 'model'
    — throughput scaling and per-image partitioning at once (the mesh lays
    'model' minor, so halos ride nearest-neighbour ICI links while the batch
    axis needs no activation traffic at all)."""
    if mesh.shape.get("model", 1) > 1:
        return P("data", "model")
    return P(None, "data")


def spatial_sharding(mesh) -> NamedSharding:
    """NHWC activation sharding for spatial mode (see spatial_spec)."""
    return NamedSharding(mesh, spatial_spec(mesh))


def spatial_h_axis_size(mesh) -> int:
    """Number of ways the image H axis is split in spatial mode."""
    n_model = mesh.shape.get("model", 1)
    return n_model if n_model > 1 else mesh.shape["data"]


def spatial_batch_axis_size(mesh) -> int:
    """Number of ways the batch axis is split in spatial mode."""
    return mesh.shape["data"] if mesh.shape.get("model", 1) > 1 else 1


def pad_batch_h(batch, multiple: int):
    """Pad a raw eval batch's H axis to a multiple (host-side).

    JAX requires sharded dimensions to divide exactly by the mesh size, so
    spatial callers pad H to n_devices (times the model block size). Padding
    follows the framework's pad-to-block eval semantics — canvas rows zero,
    label rows ignore (255), true ``sizes`` unchanged — so padded pixels are
    excluded from the confusion matrix and zeroed by the alpha-trick
    normalisation. As with the reference's pad-to-BLOCK_SIZE collate
    (reference: datapipe/seg_data.py:246-278), padded context can perturb
    predictions within a receptive field of the bottom edge; the metric
    treatment of that edge is identical to the unpadded single-device path's
    treatment of block padding.
    """
    import numpy as np

    canvas, labels = np.asarray(batch["canvas"]), np.asarray(batch["labels"])
    h = canvas.shape[1]
    new_h = -(-h // multiple) * multiple
    if new_h == h:
        return batch
    pad = new_h - h
    canvas = np.pad(canvas, ((0, 0), (0, pad), (0, 0), (0, 0)))
    labels = np.pad(labels, ((0, 0), (0, pad), (0, 0)),
                    constant_values=255)
    out = dict(batch)
    out["canvas"], out["labels"] = canvas, labels
    return out


_cache = FnCache(max_size=8)
_cached = _cache.get_or_build


def jit_spatial_forward(model, mesh):
    """(model_state, x) -> logits with x NHWC sharded on H over the mesh.

    ``x`` is already normalised. Logits come back H-sharded (same layout), so
    a chain of spatial ops stays resident; fetch or re-shard explicitly at the
    end of the chain.
    """
    sp = spatial_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def build():
        def fwd(model_state, x):
            logits, _ = apply_model(
                model, model_state.params, model_state.batch_stats, x,
                train=False, freeze_bn=True)
            return logits

        return jax.jit(fwd, in_shardings=(repl, sp), out_shardings=sp)

    return _cached(("fwd", stable_ident(model), stable_ident(mesh)), build)


def _spatial_batch_spec(mesh, leaf) -> P:
    """Partition spec for one train-batch leaf in spatial-train mode.

    Accepts anything with a shape (host array, jax array, traced tensor) —
    only ``np.shape`` is read, so no device transfer happens. Image-shaped
    tensors — (B, H, W[, C]) with a real spatial extent — carry the batch
    axis over 'data' AND the H axis over 'model'; per-sample small tensors
    (label vectors, 2x3 affine matrices, scalars) shard the batch axis
    only. The `shape[1] >= 8` guard keeps tiny non-spatial middle axes
    (e.g. the 2 rows of an affine matrix) off the model axis. An image
    leaf whose H does not divide the shard ways is an error (jax rejects
    uneven input shardings; silently data-sharding it would quietly drop
    the memory saving the caller asked for).
    """
    import numpy as _np

    shape = _np.shape(leaf)
    n_model = mesh.shape.get("model", 1)
    if n_model > 1 and len(shape) >= 3 and shape[1] >= 8:
        if shape[1] % n_model != 0:
            raise ValueError(
                f"spatial-train leaf of shape {shape}: H axis ({shape[1]}) "
                f"must divide the {n_model}-way 'model' shard")
        return P("data", "model")
    return P("data")


def jit_spatial_step(step_fn, mesh, example_batch):
    """jit a (state, batch, scalar) TRAIN step with activations spatially
    partitioned: batch over 'data', image H over 'model'.

    The data-parallel mapping (parallel.mesh.jit_sharded_step) needs
    per-chip batch >= 1; at very high resolution (full 1024x2048 Cityscapes
    frames, the x4 originals the converter downsamples from) even batch 1
    can exceed one chip's activation memory. Here each image's rows are
    sharded over the 'model' axis, so per-chip activation memory scales
    ~1/n_model through the whole conv stack — forward AND backward — with
    GSPMD inserting the halo exchanges for the convolutions and psums for
    the loss/gradient reductions. State stays replicated; the optimizer/EMA
    update is unchanged. No reference counterpart (single GPU caps training
    resolution; reference: train_seg_semisup_mask_mt.py:58) — this is the
    training-side completion of SURVEY §5's spatial-partitioning row.

    Works on the raw-tensor step batch (pre-augmented images/masks feeding
    straight into the model): input shardings fully determine the layout —
    there are no in-step gathers, so GSPMD propagates the H-sharding through
    the conv stack without extra constraints. `example_batch` provides the
    leaf shapes the per-leaf specs are derived from. The image H extent must
    divide exactly by the H-shard ways (jax rejects uneven input shardings)
    — pick the crop accordingly or pad rows with ignore labels, as
    pad_batch_h does for eval.
    """
    repl = NamedSharding(mesh, P())
    # shape inspection only — never materialises/transfers the example batch
    batch_sh = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _spatial_batch_spec(mesh, leaf)),
        example_batch)
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_spatial_predict_fn(model, mean, std, mesh):
    """(model_state, raw_batch) -> (pred (N,H,W) int32, y (N,H,W) int32).

    raw_batch is the evaluator's canvas/labels/sizes dict; the canvases are
    H-sharded across the mesh (plus batch-sharded on 2-D meshes),
    normalisation + forward + argmax run spatially partitioned, and the
    small int32 outputs are replicated for host fetch (same discipline as
    eval.evaluator.make_sharded_predict_fn).
    """
    sp = spatial_sharding(mesh)
    repl = NamedSharding(mesh, P())
    in_batch_sh = {"canvas": sp, "labels": sp, "sizes": repl}

    def build():
        def raw(model_state, batch):
            x, y, _ = normalise_eval_batch(batch, mean, std)
            logits, _ = apply_model(
                model, model_state.params, model_state.batch_stats, x,
                train=False, freeze_bn=True)
            return jnp.argmax(logits, axis=-1), y

        return jax.jit(raw, in_shardings=(repl, in_batch_sh),
                       out_shardings=(repl, repl))

    key = ("pred", stable_ident(model), stable_ident(mesh),
           tuple(jnp.asarray(mean).tolist()), tuple(jnp.asarray(std).tolist()))
    return _cached(key, build)


def make_spatial_eval_fn(model, num_classes, mean, std, mesh,
                         ignore_value: int = 255):
    """(model_state, raw_batch) -> replicated (C, C) int32 confusion matrix,
    computed with the image H axis partitioned over the mesh.

    Drop-in alternative to eval.evaluator.make_sharded_eval_fn for
    small-batch / high-resolution validation sets: each chip computes the
    confusion matrix of its slab (slab boundaries cut between pixels, so
    per-pixel confusion counts partition exactly) and XLA psums the (C, C)
    accumulator — bit-identical to the single-device matrix.
    """
    sp = spatial_sharding(mesh)
    repl = NamedSharding(mesh, P())
    in_batch_sh = {"canvas": sp, "labels": sp, "sizes": repl}

    def build():
        def eval_fn(model_state, batch):
            x, y, _ = normalise_eval_batch(batch, mean, std)
            logits, _ = apply_model(
                model, model_state.params, model_state.batch_stats, x,
                train=False, freeze_bn=True)
            pred = jnp.argmax(logits, axis=-1)
            return confusion_matrix(pred, y, num_classes, ignore_value)

        return jax.jit(eval_fn, in_shardings=(repl, in_batch_sh),
                       out_shardings=repl)

    key = ("cm", stable_ident(model), stable_ident(mesh), num_classes, ignore_value,
           tuple(jnp.asarray(mean).tolist()), tuple(jnp.asarray(std).tolist()))
    return _cached(key, build)
