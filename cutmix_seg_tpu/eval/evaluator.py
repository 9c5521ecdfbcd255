"""Sharded evaluation: jitted argmax + confusion accumulation over the mesh.

The reference pulls per-batch argmax to the host and accumulates NumPy I/U per
sample (reference: train_seg_semisup_mask_mt.py:484-517). Here the whole
batch's confusion matrix is computed on device (one scatter-add) and summed
across data-parallel shards by XLA; a single small (C, C) matrix crosses to
the host per batch. Padded pixels use the ignore value, so bucketed padding at
eval time does not perturb the metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cutmix_seg_tpu.ops.iou import confusion_matrix
from cutmix_seg_tpu.semisup.mask_mt import apply_model


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
    f = _predict_cache.get(id(model))
    if f is None:
        def raw(params, batch_stats, x):
            logits, _ = apply_model(model, params, batch_stats, x,
                                    train=False, freeze_bn=True)
            return jnp.argmax(logits, axis=-1)

        f = jax.jit(raw)
        _predict_cache[id(model)] = f
    return f(model_state.params, model_state.batch_stats, x)
