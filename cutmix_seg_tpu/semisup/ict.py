"""Fused ICT (Interpolation Consistency Training) mean-teacher step.

Re-derivation of the reference ICT baseline trainer's unsupervised branch
(reference: train_seg_semisup_ict.py:265-402) as one jitted program:

  * two unsupervised batches drawn from ONE stream;
  * per-sample mix factor lambda ~ Beta(ict_alpha, ict_alpha) — sampled on
    device with jax.random.beta (the reference uses NumPy; same distribution);
  * the student sees the blended image; the teacher's logits AND probabilities
    are blended separately with the same lambda (unlike CutMix's hard masks,
    blending probs != softmax of blended logits — the reference keeps both,
    using blended probs for 'var'/'bce'/'kld' targets and blended logits for
    the logit-space losses; ict.py:320-341,360-378);
  * confidence = blend of the two per-pixel teacher confidences.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cutmix_seg_tpu.core.train_state import TrainState
from cutmix_seg_tpu.semisup import losses as L
from cutmix_seg_tpu.semisup.stepcore import (
    ConsistencyCommon,
    apply_model,
    confidence_px,
    finish_step,
    masked_consistency,
)


@dataclasses.dataclass(frozen=True)
class ICTConfig(ConsistencyCommon):
    ict_alpha: float = 0.1


def _ict_per_px(cfg, logits_stu, logits_tea_mix, prob_tea_mix):
    """The ICT consistency-loss menu: prob-space targets are the BLENDED
    probs; logit-space targets the blended logits (reference:
    ict.py:360-378). Shared by the K=1 and grad-accum steps."""
    return L.consistency_from_prob_targets(
        cfg.cons_loss_fn, logits_stu, logits_tea_mix, prob_tea_mix)


def make_ict_step(model, tx, cfg: ICTConfig):
    """batch: sup_x, sup_y, ux0_tea, ux0_stu, um0, ux1_tea, ux1_stu, um1
    (unsup leading dim R*B). Returns step(state, batch, ramp_val)."""
    use_cons = cfg.cons_weight > 0.0
    if cfg.grad_accum > 1:
        from cutmix_seg_tpu.semisup.stepcore import validate_accum

        validate_accum(cfg, "ict")
        return _make_accum_step(model, tx, cfg)

    def step(state: TrainState, batch, ramp_val):
        # k_drop_tea: teacher runs in train() mode per the reference, so
        # dropout-bearing models draw teacher dropout masks (ict.py:272-341)
        rng, k_beta, k_drop_sup, k_drop_uns, k_drop_tea = jax.random.split(
            state.rng, 5)
        tea_state = state.teacher if cfg.mean_teacher else state.student
        tea_stats = tea_state.batch_stats

        if use_cons:
            ux0, ux1 = batch["ux0_stu"], batch["ux1_stu"]
            n = ux0.shape[0]
            lam = jax.random.beta(
                k_beta, cfg.ict_alpha, cfg.ict_alpha, shape=(n, 1, 1, 1)
            ).astype(ux0.dtype)
            x_mixed = ux0 * (1.0 - lam) + ux1 * lam
            um_mixed = batch["um0"] * (1.0 - lam) + batch["um1"] * lam

            if cfg.freeze_bn:
                # frozen BN: one concatenated teacher forward (identical math,
                # better MXU utilisation)
                tea_both, tea_stats = apply_model(
                    model, tea_state.params, tea_stats,
                    jnp.concatenate([batch["ux0_tea"], batch["ux1_tea"]]),
                    train=True, freeze_bn=True, rng=k_drop_tea)
                tea0, tea1 = tea_both[:n], tea_both[n:]
            else:
                tea0, tea_stats = apply_model(
                    model, tea_state.params, tea_stats, batch["ux0_tea"],
                    train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_tea)
                tea1, tea_stats = apply_model(
                    model, tea_state.params, tea_stats, batch["ux1_tea"],
                    train=True, freeze_bn=cfg.freeze_bn,
                    rng=jax.random.fold_in(k_drop_tea, 1))
            tea0 = jax.lax.stop_gradient(tea0.astype(jnp.float32))
            tea1 = jax.lax.stop_gradient(tea1.astype(jnp.float32))
            p0, p1 = jax.nn.softmax(tea0, axis=-1), jax.nn.softmax(tea1, axis=-1)
            lam32 = lam.astype(jnp.float32)
            logits_tea_mix = tea0 * (1 - lam32) + tea1 * lam32
            prob_tea_mix = p0 * (1 - lam32) + p1 * lam32
            conf_mix = (
                p0.max(axis=-1, keepdims=True) * (1 - lam32)
                + p1.max(axis=-1, keepdims=True) * lam32
            )
            conf_px = confidence_px(cfg, conf_mix)

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
                    model, params, stats, x_mixed,
                    train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_uns)
                logits_stu = logits_stu.astype(jnp.float32)
                per_px = _ict_per_px(cfg, logits_stu, logits_tea_mix,
                                     prob_tea_mix)
                loss_sum, loss_mean, conf_rate = masked_consistency(
                    cfg, per_px, um_mixed.astype(jnp.float32), conf_px)
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


def _make_accum_step(model, tx, cfg: ICTConfig):
    """grad_accum > 1 ICT: the per-sample Beta draws and the image/mask
    blends are computed for the FULL batch up-front (cheap, element-wise), so
    the lambda stream is independent of K; teacher forwards and the student
    fwd+bwd run per micro-chunk inside lax.scan (see
    semisup/mask_mt.py::_make_accum_step for the shared semantics: strided
    chunks, mean-of-chunk gradients, training-BN stats threading, and the
    documented batch-mean-gate / ignore-label CE deviations)."""
    from cutmix_seg_tpu.semisup.stepcore import (
        accum_zero_metrics,
        chunk_strided,
        run_accum_scan,
    )

    use_cons = cfg.cons_weight > 0.0
    K = cfg.grad_accum

    def step(state: TrainState, batch, ramp_val):
        rng, k_beta, k_drop_sup, k_drop_uns, k_drop_tea = jax.random.split(
            state.rng, 5)
        tea_state = state.teacher if cfg.mean_teacher else state.student

        def chunk(x):
            return chunk_strided(x, K)

        scan_in = {"sup_x": chunk(batch["sup_x"]),
                   "sup_y": chunk(batch["sup_y"])}
        if use_cons:
            ux0, ux1 = batch["ux0_stu"], batch["ux1_stu"]
            n = ux0.shape[0]
            # full-batch draw with the SAME key/shape as K=1: the lambda
            # stream does not depend on K
            lam = jax.random.beta(
                k_beta, cfg.ict_alpha, cfg.ict_alpha, shape=(n, 1, 1, 1)
            ).astype(ux0.dtype)
            scan_in.update(
                tea0_in=chunk(batch["ux0_tea"]), tea1_in=chunk(batch["ux1_tea"]),
                x_mixed=chunk(ux0 * (1.0 - lam) + ux1 * lam),
                um_mixed=chunk(batch["um0"] * (1.0 - lam)
                               + batch["um1"] * lam),
                lam=chunk(lam.astype(jnp.float32)))

        def one_chunk(stu_stats, tea_stats, inp):
            i = inp["i"]
            k_tea = jax.random.fold_in(k_drop_tea, i)
            if use_cons:
                nc = inp["x_mixed"].shape[0]
                if cfg.freeze_bn:
                    tea_both, tea_stats = apply_model(
                        model, tea_state.params, tea_stats,
                        jnp.concatenate([inp["tea0_in"], inp["tea1_in"]]),
                        train=True, freeze_bn=True, rng=k_tea)
                    tea0, tea1 = tea_both[:nc], tea_both[nc:]
                else:
                    tea0, tea_stats = apply_model(
                        model, tea_state.params, tea_stats, inp["tea0_in"],
                        train=True, freeze_bn=False, rng=k_tea)
                    tea1, tea_stats = apply_model(
                        model, tea_state.params, tea_stats, inp["tea1_in"],
                        train=True, freeze_bn=False,
                        rng=jax.random.fold_in(k_tea, 1))
                tea0 = jax.lax.stop_gradient(tea0.astype(jnp.float32))
                tea1 = jax.lax.stop_gradient(tea1.astype(jnp.float32))
                p0 = jax.nn.softmax(tea0, axis=-1)
                p1 = jax.nn.softmax(tea1, axis=-1)
                lam32 = inp["lam"]
                logits_tea_mix = tea0 * (1 - lam32) + tea1 * lam32
                prob_tea_mix = p0 * (1 - lam32) + p1 * lam32
                conf_mix = (
                    p0.max(axis=-1, keepdims=True) * (1 - lam32)
                    + p1.max(axis=-1, keepdims=True) * lam32)
                conf_px = confidence_px(cfg, conf_mix)

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
                        model, params, stats, inp["x_mixed"],
                        train=True, freeze_bn=cfg.freeze_bn,
                        rng=jax.random.fold_in(k_drop_uns, i))
                    logits_stu = logits_stu.astype(jnp.float32)
                    per_px = _ict_per_px(cfg, logits_stu, logits_tea_mix,
                                         prob_tea_mix)
                    loss_sum, loss_mean, conf_rate = masked_consistency(
                        cfg, per_px, inp["um_mixed"].astype(jnp.float32),
                        conf_px)
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
