"""Fused augmentation-driven consistency step (aug_mt).

Re-derivation of the reference's augmentation-driven trainer branch
(reference: train_seg_semisup_aug_mt.py:267-402): the two elements of each
unsupervised pair receive DIFFERENT geometric augmentations; the teacher
predicts on element 0 and its logits + valid mask are warped into element 1's
frame with the pair's relative affine transform (grid-sample convention,
align_corners=True), where the student's prediction on element 1 is compared.

The relative transform xf0->1 is composed on the host from the two per-sample
crop matrices (the reference computes it in SegCollate;
datapipe/seg_data.py:219-232) and enters the step as a (N, 2, 3) grid-space
matrix; the warp itself is the batched gather resampler
(cutmix_seg_tpu.ops.resample.grid_sample_affine) inside the same XLA program.

Note: the reference's 'logits_var' branch has a bug (it reuses the stale
probability delta; aug_mt.py:370-374, SURVEY.md §5) so it degenerates to
'var'. We implement the correct logit-space loss; the default config ('var')
is unaffected.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cutmix_seg_tpu.core.train_state import TrainState
from cutmix_seg_tpu.ops.resample import grid_sample_affine
from cutmix_seg_tpu.semisup import losses as L
from cutmix_seg_tpu.semisup.stepcore import (
    ConsistencyCommon,
    apply_model,
    confidence_px,
    finish_step,
    masked_consistency,
)


@dataclasses.dataclass(frozen=True)
class AugConsConfig(ConsistencyCommon):
    pass


def _aug_per_px(cfg, logits_stu, logits_tea_in_stu, prob_tea_in_stu):
    """The aug_mt consistency-loss menu: targets are the WARPED teacher
    quantities — probs for prob-space losses, logits for logit-space losses.
    Shared by the K=1 and grad-accum steps."""
    return L.consistency_from_prob_targets(
        cfg.cons_loss_fn, logits_stu, logits_tea_in_stu, prob_tea_in_stu)


def make_aug_cons_step(model, tx, cfg: AugConsConfig):
    """batch: sup_x, sup_y, ux0 (teacher image), ux1 (student image),
    um0, um1, xf0_to_1 (grid-space (N,2,3)). Returns
    step(state, batch, ramp_val)."""
    use_cons = cfg.cons_weight > 0.0
    if cfg.grad_accum > 1:
        from cutmix_seg_tpu.semisup.stepcore import validate_accum

        validate_accum(cfg, "aug_mt")
        return _make_accum_step(model, tx, cfg)

    def step(state: TrainState, batch, ramp_val):
        # k_drop_tea: teacher runs in train() mode per the reference
        # (train_seg_semisup_aug_mt.py teacher forward)
        rng, k_drop_sup, k_drop_uns, k_drop_tea = jax.random.split(
            state.rng, 4)
        tea_state = state.teacher if cfg.mean_teacher else state.student
        tea_stats = tea_state.batch_stats

        if use_cons:
            x0, x1 = batch["ux0"], batch["ux1"]
            hw = x1.shape[1:3]
            theta = batch["xf0_to_1"].astype(jnp.float32)

            logits_tea, tea_stats = apply_model(
                model, tea_state.params, tea_stats, x0,
                train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_tea)
            logits_tea = jax.lax.stop_gradient(logits_tea.astype(jnp.float32))
            prob_tea = jax.nn.softmax(logits_tea, axis=-1)

            # warp teacher logits / probs / valid mask into the student frame
            logits_tea_in_stu = grid_sample_affine(logits_tea, theta, hw)
            prob_tea_in_stu = grid_sample_affine(prob_tea, theta, hw)
            um0_in_stu = grid_sample_affine(
                batch["um0"].astype(jnp.float32), theta, hw)
            loss_mask = um0_in_stu * batch["um1"].astype(jnp.float32)
            conf_px = confidence_px(
                cfg, prob_tea_in_stu.max(axis=-1, keepdims=True))

        def loss_fn(params):
            logits_sup, stats = apply_model(
                model, params, state.student.batch_stats, batch["sup_x"],
                train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_sup)
            sup_loss = L.cross_entropy_ignore(
                logits_sup, batch["sup_y"], cfg.ignore_value)
            metrics = {"sup_loss": sup_loss}
            total = sup_loss
            if use_cons:
                logits_stu, stats = apply_model(
                    model, params, stats, x1,
                    train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_uns)
                logits_stu = logits_stu.astype(jnp.float32)
                per_px = _aug_per_px(cfg, logits_stu, logits_tea_in_stu,
                                     prob_tea_in_stu)
                loss_sum, loss_mean, conf_rate = masked_consistency(
                    cfg, per_px, loss_mask, conf_px)
                total = total + loss_sum * ramp_val * cfg.cons_weight
                metrics["cons_loss"] = loss_mean
                metrics["conf_rate"] = conf_rate
            return total, (stats, metrics)

        grads, (new_stu_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.student.params)
        new_state = finish_step(state, tx, grads, new_stu_stats,
                                tea_state.params, tea_stats, cfg, rng)
        return new_state, metrics

    return step


def _make_accum_step(model, tx, cfg: AugConsConfig):
    """grad_accum > 1 aug_mt: the pair transform, teacher forward + warp, and
    student fwd+bwd are all per-sample operations, so they chunk exactly; the
    teacher forward and warps run per micro-chunk inside lax.scan. See
    semisup/mask_mt.py::_make_accum_step for the shared accumulation
    semantics (strided chunks, mean-of-chunk gradients, training-BN stats
    threading, documented gate/CE deviations)."""
    from cutmix_seg_tpu.semisup.stepcore import (
        accum_zero_metrics,
        chunk_strided,
        run_accum_scan,
    )

    use_cons = cfg.cons_weight > 0.0
    K = cfg.grad_accum

    def step(state: TrainState, batch, ramp_val):
        rng, k_drop_sup, k_drop_uns, k_drop_tea = jax.random.split(
            state.rng, 4)
        tea_state = state.teacher if cfg.mean_teacher else state.student

        def chunk(x):
            return chunk_strided(x, K)

        scan_in = {"sup_x": chunk(batch["sup_x"]),
                   "sup_y": chunk(batch["sup_y"])}
        if use_cons:
            scan_in.update(
                ux0=chunk(batch["ux0"]), ux1=chunk(batch["ux1"]),
                um0=chunk(batch["um0"].astype(jnp.float32)),
                um1=chunk(batch["um1"].astype(jnp.float32)),
                xf=chunk(batch["xf0_to_1"].astype(jnp.float32)))

        def one_chunk(stu_stats, tea_stats, inp):
            i = inp["i"]
            if use_cons:
                hw = inp["ux1"].shape[1:3]
                logits_tea, tea_stats = apply_model(
                    model, tea_state.params, tea_stats, inp["ux0"],
                    train=True, freeze_bn=cfg.freeze_bn,
                    rng=jax.random.fold_in(k_drop_tea, i))
                logits_tea = jax.lax.stop_gradient(
                    logits_tea.astype(jnp.float32))
                prob_tea = jax.nn.softmax(logits_tea, axis=-1)
                logits_tea_in_stu = grid_sample_affine(
                    logits_tea, inp["xf"], hw)
                prob_tea_in_stu = grid_sample_affine(prob_tea, inp["xf"], hw)
                um0_in_stu = grid_sample_affine(inp["um0"], inp["xf"], hw)
                loss_mask = um0_in_stu * inp["um1"]
                conf_px = confidence_px(
                    cfg, prob_tea_in_stu.max(axis=-1, keepdims=True))

            def loss_fn(params):
                logits_sup, stats = apply_model(
                    model, params, stu_stats, inp["sup_x"],
                    train=True, freeze_bn=cfg.freeze_bn,
                    rng=jax.random.fold_in(k_drop_sup, i))
                sup_loss = L.cross_entropy_ignore(
                    logits_sup, inp["sup_y"], cfg.ignore_value)
                metrics = {"sup_loss": sup_loss}
                total = sup_loss
                if use_cons:
                    logits_stu, stats = apply_model(
                        model, params, stats, inp["ux1"],
                        train=True, freeze_bn=cfg.freeze_bn,
                        rng=jax.random.fold_in(k_drop_uns, i))
                    logits_stu = logits_stu.astype(jnp.float32)
                    per_px = _aug_per_px(cfg, logits_stu, logits_tea_in_stu,
                                         prob_tea_in_stu)
                    loss_sum, loss_mean, conf_rate = masked_consistency(
                        cfg, per_px, loss_mask, conf_px)
                    total = total + loss_sum * ramp_val * cfg.cons_weight
                    metrics["cons_loss"] = loss_mean
                    metrics["conf_rate"] = conf_rate
                return total, (stats, metrics)

            grads, (new_stu_stats, metrics) = jax.grad(
                loss_fn, has_aux=True)(state.student.params)
            return grads, new_stu_stats, tea_stats, metrics

        grads, metrics, stu_stats, tea_stats = run_accum_scan(
            K, state.student.params, accum_zero_metrics(use_cons), scan_in,
            one_chunk, state.student.batch_stats, tea_state.batch_stats)
        new_state = finish_step(state, tx, grads, stu_stats,
                                tea_state.params, tea_stats, cfg, rng)
        return new_state, metrics

    return step
