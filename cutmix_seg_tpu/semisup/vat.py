"""Fused VAT (Virtual Adversarial Training) mean-teacher step.

Re-derivation of the reference VAT baseline's unsupervised branch
(reference: train_seg_semisup_vat_mt.py:213-301,397-464) as one jitted
program. The 1-step power iteration becomes a ``jax.grad`` w.r.t. the noise
inside the step — no double-backward is needed for the outer loss because the
adversarial offset is stop-gradient'd, exactly like the reference's
``.detach()`` (vat_mt.py:301):

  * direction net: teacher by default, student with vat_dir_from_student,
    run in EVAL mode (running BN stats, no dropout; vat_mt.py:237);
  * eps ~ N(0, 1) normalised per-sample to unit L2, scaled by
    1e-6 * H * W / 1000;
  * direction = normalised grad of the summed consistency loss between
    net(x_stu + eps) and net(x_tea) w.r.t. eps;
  * radius: fixed vat_radius * sqrt(C*H*W), or adaptive from the image
    Jacobian (central differences, * 0.5) when adaptive_vat_radius;
  * the student then sees x_stu + direction * radius, with the standard
    teacher-consistency loss menu on teacher(x_tea).
"""

from __future__ import annotations

import dataclasses
import math

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
class VATConfig(ConsistencyCommon):
    vat_radius: float = 0.5
    adaptive_vat_radius: bool = False
    vat_dir_from_student: bool = False


def _normalize_per_sample(x):
    mag = jnp.sqrt((x.reshape(x.shape[0], -1) ** 2).sum(axis=1))
    return x / (mag[:, None, None, None] + 1e-12)


def _vat_sum_loss(loss_fn_name, eps_logits, y_logits):
    """The SUMMED consistency loss used inside the power step
    (reference: vat_mt.py:250-262)."""
    y_prob = jax.nn.softmax(y_logits, axis=-1)
    if loss_fn_name == "var":
        d = jax.nn.softmax(eps_logits, axis=-1) - y_prob
        return (d * d).sum()
    if loss_fn_name == "bce":
        return L.robust_binary_crossentropy(
            jax.nn.softmax(eps_logits, axis=-1), y_prob).sum()
    if loss_fn_name == "kld":
        logp = jax.nn.log_softmax(eps_logits, axis=-1)
        safe = jnp.maximum(y_prob, 1e-20)
        return (y_prob * (jnp.log(safe) - logp)).sum()
    if loss_fn_name == "logits_var":
        d = eps_logits - y_logits
        return (d * d).sum()
    raise ValueError(f"unsupported VAT direction loss {loss_fn_name!r}")


def make_vat_step(model, tx, cfg: VATConfig):
    """batch: sup_x, sup_y, ux_tea, ux_stu, um. Returns
    step(state, batch, ramp_val)."""
    use_cons = cfg.cons_weight > 0.0
    if cfg.grad_accum > 1:
        from cutmix_seg_tpu.semisup.stepcore import validate_accum

        validate_accum(cfg, "vat_mt")
        return _make_accum_step(model, tx, cfg)

    def step(state: TrainState, batch, ramp_val):
        # k_drop_tea: teacher runs in train() mode per the reference (the VAT
        # direction net, by contrast, runs eval() — vat_mt.py:237)
        rng, k_eps, k_drop_sup, k_drop_uns, k_drop_tea = jax.random.split(
            state.rng, 5)
        tea_state = state.teacher if cfg.mean_teacher else state.student
        tea_stats = tea_state.batch_stats

        if use_cons:
            x_tea, x_stu = batch["ux_tea"], batch["ux_stu"]
            n, h, w, c = x_stu.shape

            dir_state = state.student if cfg.vat_dir_from_student else tea_state
            dir_params = jax.lax.stop_gradient(dir_state.params)
            dir_stats = dir_state.batch_stats

            # eval-mode prediction on the (teacher-path) image
            y_logits, _ = apply_model(
                model, dir_params, dir_stats, x_tea,
                train=False, freeze_bn=True)
            y_logits = jax.lax.stop_gradient(y_logits.astype(jnp.float32))

            noise_scale = 1.0e-6 * h * w / 1000.0
            eps0 = _normalize_per_sample(
                jax.random.normal(k_eps, x_stu.shape, jnp.float32)) * noise_scale

            def dir_loss(eps):
                eps_logits, _ = apply_model(
                    model, dir_params, dir_stats, x_stu + eps,
                    train=False, freeze_bn=True)
                return _vat_sum_loss(cfg.cons_loss_fn,
                                     eps_logits.astype(jnp.float32), y_logits)

            eps_grad = jax.grad(dir_loss)(eps0)
            direction = _normalize_per_sample(eps_grad)

            if cfg.adaptive_vat_radius:
                # image-Jacobian magnitude via central differences
                # (reference: vat_mt.py:277-296)
                dv = x_stu[:, 2:, :, :] - x_stu[:, :-2, :, :]
                dh = x_stu[:, :, 2:, :] - x_stu[:, :, :-2, :]
                mag = jnp.sqrt(
                    (dv.reshape(n, -1) ** 2).sum(axis=1)
                    + (dh.reshape(n, -1) ** 2).sum(axis=1)
                )
                radius = cfg.vat_radius * mag[:, None, None, None] * 0.5
            else:
                radius = cfg.vat_radius * math.sqrt(float(c * h * w))

            x_adv = jax.lax.stop_gradient(x_stu + direction * radius)

            logits_tea, tea_stats = apply_model(
                model, tea_state.params, tea_stats, x_tea,
                train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_tea)
            logits_tea = jax.lax.stop_gradient(logits_tea.astype(jnp.float32))
            prob_tea = jax.nn.softmax(logits_tea, axis=-1)
            conf_px = confidence_px(cfg, prob_tea.max(axis=-1, keepdims=True))

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
                    model, params, stats, x_adv,
                    train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_uns)
                per_px = L.consistency_loss_per_pixel(
                    cfg.cons_loss_fn, logits_stu, logits_tea)
                loss_sum, loss_mean, conf_rate = masked_consistency(
                    cfg, per_px, batch["um"].astype(jnp.float32), conf_px)
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


def _make_accum_step(model, tx, cfg: VATConfig):
    """grad_accum > 1 VAT: the isotropic noise is drawn for the FULL batch
    up-front (same key/shape as K=1, so the noise stream is K-independent);
    the power-iteration direction, adaptive radius, teacher forward and
    student fwd+bwd run per micro-chunk inside lax.scan. The direction net
    runs in eval mode (running stats, per-sample independent), so chunked
    directions equal the full-batch directions exactly. See
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
        rng, k_eps, k_drop_sup, k_drop_uns, k_drop_tea = jax.random.split(
            state.rng, 5)
        tea_state = state.teacher if cfg.mean_teacher else state.student

        def chunk(x):
            return chunk_strided(x, K)

        scan_in = {"sup_x": chunk(batch["sup_x"]),
                   "sup_y": chunk(batch["sup_y"])}
        if use_cons:
            x_stu = batch["ux_stu"]
            n, h, w, c = x_stu.shape
            noise_scale = 1.0e-6 * h * w / 1000.0
            eps0 = _normalize_per_sample(
                jax.random.normal(k_eps, x_stu.shape, jnp.float32)
            ) * noise_scale
            scan_in.update(ux_tea=chunk(batch["ux_tea"]), ux_stu=chunk(x_stu),
                           um=chunk(batch["um"]), eps0=chunk(eps0))
            dir_state = state.student if cfg.vat_dir_from_student else tea_state
            dir_params = jax.lax.stop_gradient(dir_state.params)

        def one_chunk(stu_stats, tea_stats, inp):
            i = inp["i"]
            conf_px = logits_tea = x_adv = None
            if use_cons:
                x_tea_c, x_stu_c = inp["ux_tea"], inp["ux_stu"]
                nc = x_stu_c.shape[0]
                # dir net stats: student carry when dir_from_student, else
                # teacher carry (K-sequential-small-batches semantics; eval
                # mode never mutates them)
                dir_stats = stu_stats if cfg.vat_dir_from_student else tea_stats
                y_logits, _ = apply_model(
                    model, dir_params, dir_stats, x_tea_c,
                    train=False, freeze_bn=True)
                y_logits = jax.lax.stop_gradient(y_logits.astype(jnp.float32))

                def dir_loss(eps):
                    eps_logits, _ = apply_model(
                        model, dir_params, dir_stats, x_stu_c + eps,
                        train=False, freeze_bn=True)
                    return _vat_sum_loss(
                        cfg.cons_loss_fn, eps_logits.astype(jnp.float32),
                        y_logits)

                direction = _normalize_per_sample(jax.grad(dir_loss)(inp["eps0"]))

                if cfg.adaptive_vat_radius:
                    dv = x_stu_c[:, 2:, :, :] - x_stu_c[:, :-2, :, :]
                    dh = x_stu_c[:, :, 2:, :] - x_stu_c[:, :, :-2, :]
                    mag = jnp.sqrt(
                        (dv.reshape(nc, -1) ** 2).sum(axis=1)
                        + (dh.reshape(nc, -1) ** 2).sum(axis=1))
                    radius = cfg.vat_radius * mag[:, None, None, None] * 0.5
                else:
                    c = x_stu_c.shape[-1]
                    h, w = x_stu_c.shape[1:3]
                    radius = cfg.vat_radius * math.sqrt(float(c * h * w))
                x_adv = jax.lax.stop_gradient(x_stu_c + direction * radius)

                logits_tea, tea_stats = apply_model(
                    model, tea_state.params, tea_stats, x_tea_c,
                    train=True, freeze_bn=cfg.freeze_bn,
                    rng=jax.random.fold_in(k_drop_tea, i))
                logits_tea = jax.lax.stop_gradient(
                    logits_tea.astype(jnp.float32))
                prob_tea = jax.nn.softmax(logits_tea, axis=-1)
                conf_px = confidence_px(
                    cfg, prob_tea.max(axis=-1, keepdims=True))

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
                        model, params, stats, x_adv,
                        train=True, freeze_bn=cfg.freeze_bn,
                        rng=jax.random.fold_in(k_drop_uns, i))
                    per_px = L.consistency_loss_per_pixel(
                        cfg.cons_loss_fn, logits_stu, logits_tea)
                    loss_sum, loss_mean, conf_rate = masked_consistency(
                        cfg, per_px, inp["um"].astype(jnp.float32), conf_px)
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
