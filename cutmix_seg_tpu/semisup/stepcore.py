"""Shared machinery for the fused semi-supervised train steps.

All four algorithm steps (CutMix/Cutout mask_mt, ICT, VAT, augmentation-driven
consistency) share the same skeleton — supervised CE + algorithm-specific
consistency term under one gradient, optax update, EMA teacher update
(reference: the four train_seg_semisup_*.py trainers share this loop shape) —
with the algorithm differing only in how the student input and teacher targets
are produced. This module holds the shared pieces.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from cutmix_seg_tpu.core.train_state import ModelState, TrainState
from cutmix_seg_tpu.semisup import losses as L
from cutmix_seg_tpu.semisup.ema import ema_update


@dataclasses.dataclass(frozen=True)
class ConsistencyCommon:
    """Options shared by every consistency algorithm (CLI surface parity)."""

    cons_loss_fn: str = "var"
    cons_weight: float = 1.0
    conf_thresh: float = 0.97
    conf_per_pixel: bool = False
    freeze_bn: bool = True
    mean_teacher: bool = True
    teacher_alpha: float = 0.99
    unsup_batch_ratio: int = 1
    ignore_value: int = 255


def apply_model(model, params, batch_stats, x, *, train, freeze_bn, rng=None):
    """Forward through a SegModel, returning (logits, new_batch_stats)."""
    variables = {"params": params}
    has_stats = bool(batch_stats)
    if has_stats:
        variables["batch_stats"] = batch_stats
    rngs = {"dropout": rng} if rng is not None else None
    if train and not freeze_bn and has_stats:
        out, updates = model.module.apply(
            variables, x, train=train, freeze_bn=freeze_bn,
            mutable=["batch_stats"], rngs=rngs,
        )
        return out, updates["batch_stats"]
    out = model.module.apply(variables, x, train=train, freeze_bn=freeze_bn, rngs=rngs)
    return out, batch_stats


def masked_consistency(cfg: ConsistencyCommon, per_px, loss_mask, conf_px):
    """Apply valid-mask + confidence gating and reduce per sub-batch.

    per_px: (R*B, H, W, 1) consistency loss; loss_mask: same shape;
    conf_px: per-pixel confidence mask or None (conf_thresh == 0).
    Returns (loss_sum over R sub-batch means, mean loss, conf_rate) matching
    the reference's per-unsup-batch (loss * mask).mean() + separate backwards
    (reference: train_seg_semisup_mask_mt.py:404-459).
    """
    R = cfg.unsup_batch_ratio

    def subbatch_mean(arr):
        return arr.reshape((R, -1)).mean(axis=1)

    if conf_px is not None:
        conf_rates = subbatch_mean(conf_px)
        if cfg.conf_per_pixel:
            masked = subbatch_mean(per_px * (loss_mask * conf_px))
        else:
            masked = subbatch_mean(per_px * loss_mask) * conf_rates
        conf_rate = conf_rates.mean()
    else:
        masked = subbatch_mean(per_px * loss_mask)
        conf_rate = jnp.float32(1.0)
    return masked.sum(), masked.mean(), conf_rate


def confidence_px(cfg: ConsistencyCommon, conf_tea):
    """Per-pixel confidence mask from (R*B, H, W, 1) teacher confidences."""
    if cfg.conf_thresh > 0.0:
        return (conf_tea >= cfg.conf_thresh).astype(jnp.float32)
    return None


def finish_step(state: TrainState, tx, grads, new_stu_stats, tea_params,
                tea_stats, cfg: ConsistencyCommon, new_rng) -> TrainState:
    """Optimizer update + EMA teacher update + step advance. ``new_rng`` is
    the step's already-advanced PRNG key (each step splits state.rng once)."""
    updates, new_opt_state = tx.update(grads, state.opt_state, state.student.params)
    new_params = optax.apply_updates(state.student.params, updates)
    new_student = ModelState(params=new_params, batch_stats=new_stu_stats)

    if cfg.mean_teacher:
        tea_after_fwd = ModelState(params=tea_params, batch_stats=tea_stats)
        new_teacher = ema_update(tea_after_fwd, new_student, cfg.teacher_alpha)
    else:
        new_teacher = state.teacher  # pi-model placeholder (empty)

    return TrainState(
        step=state.step + 1,
        student=new_student,
        teacher=new_teacher,
        opt_state=new_opt_state,
        rng=new_rng,
    )
