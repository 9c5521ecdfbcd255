"""Fused CutMix / Cutout mean-teacher train step (the headline algorithm).

One jitted XLA program per iteration performs everything the reference's hot
loop does across many host-dispatched kernels
(reference: train_seg_semisup_mask_mt.py:287-467):

  supervised CE on the student, box-mask sampling + rasterisation, CutMix
  blending of the two unsupervised batches (or Cutout zeroing), two teacher
  forwards (no-grad), student forward on the mixed image, teacher-logit
  blending, confidence thresholding, the consistency-loss menu, a single
  gradient of ``sup + w * ramp * cons`` (identical gradients to the
  reference's two separate backwards, since they are summed into one
  optimizer step), the optax update, and the EMA teacher update.

Data parallelism: the step is pure and batched — jit it over a Mesh with the
batch sharded on the 'data' axis and the state replicated; XLA inserts the
gradient all-reduce over ICI.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cutmix_seg_tpu.core.train_state import TrainState
from cutmix_seg_tpu.masks.box_mask import (
    BoxMaskConfig,
    sample_box_rects,
    sample_masks,
)
from cutmix_seg_tpu.ops.pallas_cutmix import cutmix_blend_sharded
from cutmix_seg_tpu.semisup import losses as L
from cutmix_seg_tpu.semisup.stepcore import (
    ConsistencyCommon,
    apply_model,
    confidence_px,
    finish_step,
    masked_consistency,
)

__all__ = ["MaskConsistencyConfig", "make_mask_mt_step", "apply_model"]


@dataclasses.dataclass(frozen=True)
class MaskConsistencyConfig(ConsistencyCommon):
    mask_mode: str = "mix"  # 'mix' (CutMix) | 'zero' (Cutout)
    box: BoxMaskConfig = BoxMaskConfig((0.5, 0.5))
    # Pallas fused rasterise+blend kernel: 'auto' (on TPU backends),
    # 'on', or 'off' (jnp rasterise + XLA-fused blend)
    pallas_cutmix: str = "auto"


def make_mask_mt_step(model, tx, cfg: MaskConsistencyConfig, mesh=None):
    """Build the jittable step function.

    ``mesh``: when the step will be jitted with the batch sharded over a
    'data' mesh axis, pass the mesh so the Pallas CutMix fast path
    shard_maps with the batch (no-op for the jnp path and 1-wide meshes).

    batch dict (leading dim B for sup, R*B for unsup where
    R = unsup_batch_ratio; all images normalised NHWC float, labels int NHW,
    valid masks NHW1 float):
      sup_x, sup_y
      mix mode: ux0_tea, ux0_stu, um0, ux1_tea, ux1_stu, um1
      zero mode: ux_tea, ux_stu, um
    (the _tea/_stu pairs differ only under strong colour augmentation; pass
    the same array for both otherwise — reference:
    train_seg_semisup_mask_mt.py:313-331.)

    Returns step(state, batch, ramp_val) -> (state, metrics).
    """
    use_cons = cfg.cons_weight > 0.0

    def step(state: TrainState, batch, ramp_val):
        # k_drop_tea: the reference's teacher runs in train() mode, so
        # dropout-bearing models (DenseUNet) draw fresh teacher dropout masks
        # per forward (reference: train_seg_semisup_mask_mt.py:268-275,354)
        rng, k_mask, k_drop_sup, k_drop_uns, k_drop_tea = jax.random.split(
            state.rng, 5)
        tea_state = state.teacher if cfg.mean_teacher else state.student
        tea_stats = tea_state.batch_stats

        # ---- teacher forwards + mixing geometry: all outside the grad ----
        if use_cons:
            if cfg.mask_mode == "mix":
                ux_stu0, ux_stu1 = batch["ux0_stu"], batch["ux1_stu"]
                n, hw = ux_stu0.shape[0], ux_stu0.shape[1:3]
                use_pallas = cfg.pallas_cutmix == "on" or (
                    cfg.pallas_cutmix == "auto"
                    and jax.default_backend() in ("tpu", "axon")
                )
                if use_pallas:
                    rects = sample_box_rects(cfg.box, k_mask, n, hw)
                    x_stu_cons, m = cutmix_blend_sharded(
                        ux_stu0, ux_stu1, rects, invert=cfg.box.invert,
                        mesh=mesh)
                else:
                    m = sample_masks(cfg.box, k_mask, n, hw, dtype=ux_stu0.dtype)
                    x_stu_cons = ux_stu0 * (1.0 - m) + ux_stu1 * m
                loss_mask = batch["um0"] * (1.0 - m) + batch["um1"] * m
                # reference runs the teacher in train() mode (BN stats update
                # unless frozen; train_seg_semisup_mask_mt.py:268-275,354-356)
                if cfg.freeze_bn:
                    # frozen BN: one concatenated forward keeps the MXU busier
                    # than two half-size launches and is numerically identical
                    tea_both, tea_stats = apply_model(
                        model, tea_state.params, tea_stats,
                        jnp.concatenate([batch["ux0_tea"], batch["ux1_tea"]]),
                        train=True, freeze_bn=True, rng=k_drop_tea)
                    tea0, tea1 = tea_both[:n], tea_both[n:]
                else:
                    # training BN updates stats per forward: keep the
                    # reference's two sequential passes
                    tea0, tea_stats = apply_model(
                        model, tea_state.params, tea_stats, batch["ux0_tea"],
                        train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_tea)
                    tea1, tea_stats = apply_model(
                        model, tea_state.params, tea_stats, batch["ux1_tea"],
                        train=True, freeze_bn=cfg.freeze_bn,
                        rng=jax.random.fold_in(k_drop_tea, 1))
                logits_tea = tea0 * (1.0 - m) + tea1 * m
            elif cfg.mask_mode == "zero":
                ux_stu = batch["ux_stu"]
                n, hw = ux_stu.shape[0], ux_stu.shape[1:3]
                m = sample_masks(cfg.box, k_mask, n, hw, dtype=ux_stu.dtype)
                x_stu_cons = ux_stu * m
                loss_mask = m * batch["um"]
                logits_tea, tea_stats = apply_model(
                    model, tea_state.params, tea_stats, batch["ux_tea"],
                    train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_tea)
            else:
                raise ValueError(f"unknown mask_mode {cfg.mask_mode!r}")
            logits_tea = jax.lax.stop_gradient(logits_tea.astype(jnp.float32))
            prob_tea = jax.nn.softmax(logits_tea, axis=-1)
            conf_px = confidence_px(cfg, prob_tea.max(axis=-1, keepdims=True))
            loss_mask = loss_mask.astype(jnp.float32)

        # ---- student losses under grad ----
        fuse_student = (
            use_cons and cfg.freeze_bn
            and batch["sup_x"].shape[1:] == x_stu_cons.shape[1:]
        )

        def loss_fn(params):
            metrics = {}
            if fuse_student:
                # one fwd+bwd over [sup | cons] (frozen BN => identical math)
                n_sup = batch["sup_x"].shape[0]
                logits_all, stats = apply_model(
                    model, params, state.student.batch_stats,
                    jnp.concatenate([batch["sup_x"], x_stu_cons]),
                    train=True, freeze_bn=True, rng=k_drop_sup,
                )
                logits_sup = logits_all[:n_sup]
                logits_stu = logits_all[n_sup:]
            else:
                logits_sup, stats = apply_model(
                    model, params, state.student.batch_stats, batch["sup_x"],
                    train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_sup,
                )
                logits_stu = None
            sup_loss = L.cross_entropy_ignore(
                logits_sup, batch["sup_y"], cfg.ignore_value
            )
            metrics["sup_loss"] = sup_loss
            total = sup_loss
            if use_cons:
                if logits_stu is None:
                    logits_stu, stats = apply_model(
                        model, params, stats, x_stu_cons,
                        train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_uns,
                    )
                per_px = L.consistency_loss_per_pixel(
                    cfg.cons_loss_fn, logits_stu, logits_tea
                )
                loss_sum, loss_mean, conf_rate = masked_consistency(
                    cfg, per_px, loss_mask, conf_px)
                total = total + loss_sum * ramp_val * cfg.cons_weight
                metrics["cons_loss"] = loss_mean
                metrics["conf_rate"] = conf_rate
            return total, (stats, metrics)

        grads, (new_stu_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.student.params
        )
        new_state = finish_step(state, tx, grads, new_stu_stats,
                                tea_state.params, tea_stats, cfg, rng)
        return new_state, metrics

    return step
