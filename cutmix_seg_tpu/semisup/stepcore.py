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
    # Gradient accumulation (all four algorithms): split the step's batch
    # into K sequential micro-chunks (teacher forward + student fwd/bwd per
    # chunk inside one lax.scan), cutting peak activation memory ~K-fold so
    # the paper's batch sizes fit memory-constrained chips. One optimizer +
    # EMA update per step, gradient = mean of micro-chunk gradients. With
    # training BN the batch statistics update per chunk, sequentially — the
    # exact semantics of running K sequential small batches (no reference
    # counterpart — TPU production extra).
    grad_accum: int = 1


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


# ---- gradient accumulation (shared by the four algorithm accum steps) ----

def validate_accum(cfg: ConsistencyCommon, algo: str):
    """Common grad_accum preconditions (same contract for every algorithm)."""
    if cfg.unsup_batch_ratio != 1:
        raise ValueError(
            f"{algo}: grad_accum > 1 requires unsup_batch_ratio == 1 "
            "(chunking must not cut across unsupervised sub-batches)")
    if cfg.conf_thresh > 0.0 and not cfg.conf_per_pixel \
            and cfg.cons_weight > 0.0:
        import warnings

        warnings.warn(
            f"{algo}: grad_accum > 1 with the batch-mean confidence gate "
            "(conf_per_pixel=False): each micro-chunk is gated by its own "
            "mean confidence rather than the full batch's, so the gradient "
            "is the standard accumulation average, not bit-equal to "
            "grad_accum=1. Pass conf_per_pixel=True for exact chunk "
            "decomposition.", stacklevel=4)


def chunk_strided(x, K: int):
    """(N, ...) -> (K, N//K, ...) STRIDED chunks (chunk k = x[k::K]).

    Under a data-sharded mesh every strided chunk stays spread across all
    devices (contiguous blocks would land on a device subset and force a
    reshard per scan step); the gradient mean is permutation-invariant, so
    chunk composition is free to choose."""
    if x.shape[0] % K != 0:
        raise ValueError(f"batch size {x.shape[0]} not divisible by "
                         f"grad_accum={K}")
    return jnp.swapaxes(x.reshape((x.shape[0] // K, K) + x.shape[1:]), 0, 1)


def run_accum_scan(K: int, params, zero_metrics, scan_in, one_chunk,
                   stu_stats0, tea_stats0):
    """Drive the accumulation lax.scan.

    one_chunk(stu_stats, tea_stats, inp) -> (grads, new_stu_stats,
    new_tea_stats, metrics); ``inp`` carries chunk k of every scan_in leaf
    plus inp['i'] = k. BatchNorm statistics thread through the carry, so with
    training BN the chunks update stats sequentially (the semantics of K
    sequential small batches); frozen-BN chunk functions return their inputs
    unchanged. Returns (grads/K, metrics/K, stu_stats, tea_stats)."""
    scan_in = dict(scan_in, i=jnp.arange(K))

    def body(carry, inp):
        grads_acc, metrics_acc, stu_stats, tea_stats = carry
        grads, new_stu, new_tea, metrics = one_chunk(stu_stats, tea_stats, inp)
        return (jax.tree_util.tree_map(jnp.add, grads_acc, grads),
                jax.tree_util.tree_map(jnp.add, metrics_acc, metrics),
                new_stu, new_tea), None

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    (grads, metrics, stu_stats, tea_stats), _ = jax.lax.scan(
        body, (zero_grads, zero_metrics, stu_stats0, tea_stats0), scan_in)
    return (jax.tree_util.tree_map(lambda g: g / K, grads),
            jax.tree_util.tree_map(lambda v: v / K, metrics),
            stu_stats, tea_stats)


def accum_zero_metrics(use_cons: bool):
    z = {"sup_loss": jnp.float32(0.0)}
    if use_cons:
        z.update(cons_loss=jnp.float32(0.0), conf_rate=jnp.float32(0.0))
    return z


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
