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
    # grad_accum inherited from ConsistencyCommon; masks are sampled for the
    # FULL batch up-front, so the CutMix stream is identical for every K.
    #
    # Consistency-chain compute dtype: 'float32' (reference parity) or
    # 'bfloat16'. The blended teacher logits ride through HBM at
    # (R*B, H, W, C) scale; bf16 halves that traffic. Softmax/loss internals
    # stay f32 (fused, never materialised). PARITY NOTE (analytic): bf16
    # logits quantise to ~2^-8 relative steps, so pixels whose max-prob lies
    # within O(1e-3) of conf_thresh can flip their gate vs the f32 chain.
    # MEASURED (results_evidence/loss_chain/probe.json): the whole chain is
    # fusion-hidden on v5e — bf16 moves the 127 ms step by <1 ms — so this
    # stays 'float32' by default and exists for memory-limited configs.
    cons_compute_dtype: str = "float32"
    # Recompute the per-pixel loss chains (softmax/log-softmax) in the
    # backward pass instead of saving their (B, H, W, C) f32 intermediates:
    # identical math, trades cheap elementwise recompute for an HBM
    # residual round-trip.
    remat_loss_chain: bool = False
    # Dtype of the loss-side softmax chains THEMSELVES (supervised
    # log-softmax, consistency softmax/diff, confidence softmax-max):
    # 'float32' (reference parity) or 'bfloat16'. This is the one lever
    # cons_compute_dtype does not cover — that option halves the teacher
    # LOGIT chain but the softmax arithmetic still ran f32. Gate-parity
    # evidence: zero bf16-vs-f32 conf-gate flips over 10.3M pixels at a
    # CONVERGED teacher at both 0.8 and 0.97
    # (results_evidence/voc_matched_pair/summary.json). Pixel sums /
    # masked means always accumulate f32 (losses.py).
    loss_softmax_dtype: str = "float32"


def _mix_geometry(cfg: MaskConsistencyConfig, batch, k_mask, mesh):
    """Full-batch mask sampling + blending shared by the plain and
    grad-accum steps: returns (x_stu_cons, m, loss_mask) for 'mix'/'zero'.
    Raises on unknown mask_mode."""
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
                ux_stu0, ux_stu1, rects, invert=cfg.box.invert, mesh=mesh)
        else:
            m = sample_masks(cfg.box, k_mask, n, hw, dtype=ux_stu0.dtype)
            x_stu_cons = ux_stu0 * (1.0 - m) + ux_stu1 * m
        loss_mask = batch["um0"] * (1.0 - m) + batch["um1"] * m
    elif cfg.mask_mode == "zero":
        ux_stu = batch["ux_stu"]
        n, hw = ux_stu.shape[0], ux_stu.shape[1:3]
        m = sample_masks(cfg.box, k_mask, n, hw, dtype=ux_stu.dtype)
        x_stu_cons = ux_stu * m
        loss_mask = m * batch["um"]
    else:
        raise ValueError(f"unknown mask_mode {cfg.mask_mode!r}")
    return x_stu_cons, m, loss_mask


def _ce_tail(logits, labels, ignore_value, compute_dtype=jnp.float32):
    """Supervised-CE tail as a named function so jax.checkpoint can
    rematerialise its log-softmax instead of saving the (B, H, W, C)
    residual (remat_loss_chain)."""
    return L.cross_entropy_ignore(logits, labels, ignore_value,
                                  compute_dtype=compute_dtype)


def _cons_tail(loss_fn, logits_stu, logits_tea, compute_dtype=jnp.float32):
    """Per-pixel consistency tail (softmax chains) as a named function for
    jax.checkpoint (remat_loss_chain)."""
    return L.consistency_loss_per_pixel(loss_fn, logits_stu, logits_tea,
                                        compute_dtype=compute_dtype)


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
    if cfg.grad_accum > 1:
        from cutmix_seg_tpu.semisup.stepcore import validate_accum

        # the accum chunk losses are not wired for the loss-chain HBM
        # options; rejecting beats parse-and-ignore (the combination is
        # also redundant: accum already bounds peak activation memory)
        if (cfg.cons_compute_dtype != "float32" or cfg.remat_loss_chain
                or cfg.loss_softmax_dtype != "float32"):
            raise ValueError(
                "cons_compute_dtype='bfloat16' / remat_loss_chain / "
                "loss_softmax_dtype='bfloat16' are not supported with "
                "grad_accum > 1")
        validate_accum(cfg, "mask_mt")
        return _make_accum_step(model, tx, cfg, mesh)

    def step(state: TrainState, batch, ramp_val):
        # k_drop_tea: the reference's teacher runs in train() mode, so
        # dropout-bearing models (DenseUNet) draw fresh teacher dropout masks
        # per forward (reference: train_seg_semisup_mask_mt.py:268-275,354)
        rng, k_mask, k_drop_sup, k_drop_uns, k_drop_tea = jax.random.split(
            state.rng, 5)
        tea_state = state.teacher if cfg.mean_teacher else state.student
        tea_stats = tea_state.batch_stats

        # consistency-chain HBM dtype (blended teacher logits ride at
        # (R*B, H, W, C) scale) and loss-side softmax-chain dtype
        ldt = (jnp.bfloat16 if cfg.cons_compute_dtype == "bfloat16"
               else jnp.float32)
        sdt = (jnp.bfloat16 if cfg.loss_softmax_dtype == "bfloat16"
               else jnp.float32)

        # ---- teacher forwards + mixing geometry: all outside the grad ----
        if use_cons:
            x_stu_cons, m, loss_mask = _mix_geometry(cfg, batch, k_mask, mesh)
            if cfg.mask_mode == "mix":
                n = batch["ux0_stu"].shape[0]
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
                m_l = m.astype(ldt)
                logits_tea = (tea0.astype(ldt) * (1.0 - m_l)
                              + tea1.astype(ldt) * m_l)
            else:  # 'zero' (unknown modes rejected by _mix_geometry)
                logits_tea, tea_stats = apply_model(
                    model, tea_state.params, tea_stats, batch["ux_tea"],
                    train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_tea)
                logits_tea = logits_tea.astype(ldt)
            logits_tea = jax.lax.stop_gradient(logits_tea)
            # confidence: softmax in the loss-softmax dtype inside the fused
            # max-reduction — only the (.., 1) max-prob map is materialised,
            # never the (.., C) probability tensor; the gate compare runs f32
            conf = jax.nn.softmax(
                logits_tea.astype(sdt), axis=-1
            ).max(axis=-1, keepdims=True).astype(jnp.float32)
            conf_px = confidence_px(cfg, conf)
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
            ce_fn = (jax.checkpoint(_ce_tail, static_argnums=(2, 3))
                     if cfg.remat_loss_chain else _ce_tail)
            sup_loss = ce_fn(logits_sup, batch["sup_y"], cfg.ignore_value,
                             sdt)
            metrics["sup_loss"] = sup_loss
            total = sup_loss
            if use_cons:
                if logits_stu is None:
                    logits_stu, stats = apply_model(
                        model, params, stats, x_stu_cons,
                        train=True, freeze_bn=cfg.freeze_bn, rng=k_drop_uns,
                    )
                cons_tail = (jax.checkpoint(_cons_tail,
                                            static_argnums=(0, 3))
                             if cfg.remat_loss_chain else _cons_tail)
                per_px = cons_tail(cfg.cons_loss_fn, logits_stu, logits_tea,
                                   sdt)
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


def _make_accum_step(model, tx, cfg: MaskConsistencyConfig, mesh=None):
    """grad_accum > 1 variant: one optimizer step whose batch is processed
    as K sequential micro-chunks inside lax.scan. Masks / CutMix blending
    are computed for the full batch up-front (cheap, element-wise), so the
    random-mask stream is independent of K; the teacher forward and student
    fwd+bwd run per chunk, bounding peak activation memory to one chunk.
    Training BN is supported: batch statistics (teacher and student) thread
    chunk-to-chunk through the scan carry — the exact semantics of running K
    sequential small batches, which is what the memory-starved recipes
    (DenseUNet-161 ISIC, run_isic2017_experiments.sh:15-40) would otherwise
    do. Gradient = mean over chunk gradients — the standard accumulation
    contract. It equals the unchunked gradient up to f32 reduction order
    when the per-batch reductions decompose over chunks (uniform valid-pixel
    counts; per-pixel or disabled confidence gating). Two documented
    deviations from K=1 otherwise:
      * batch-mean confidence gate (conf_per_pixel=False, the paper default):
        each chunk is gated by its OWN mean confidence (warned at build time
        by stepcore.validate_accum);
      * supervised CE on ignore-label datasets (VOC-style 255 labels):
        cross_entropy_ignore normalises by each chunk's valid-pixel count, so
        the accumulated gradient is a mean of per-chunk means, not the
        full-batch valid-pixel mean — chunks with fewer valid pixels weigh
        their pixels more. Both are the standard grad-accum semantics
        (identical to running K sequential small batches)."""
    from cutmix_seg_tpu.semisup.stepcore import (
        accum_zero_metrics,
        chunk_strided,
        run_accum_scan,
    )

    use_cons = cfg.cons_weight > 0.0
    K = cfg.grad_accum

    def step(state: TrainState, batch, ramp_val):
        rng, k_mask, k_drop_sup, k_drop_uns, k_drop_tea = jax.random.split(
            state.rng, 5)
        tea_state = state.teacher if cfg.mean_teacher else state.student

        def chunk(x):
            return chunk_strided(x, K)

        scan_in = {"sup_x": chunk(batch["sup_x"]),
                   "sup_y": chunk(batch["sup_y"])}
        if use_cons:
            x_stu_cons, m, loss_mask = _mix_geometry(cfg, batch, k_mask, mesh)
            if batch["sup_x"].shape[1:] != x_stu_cons.shape[1:]:
                raise ValueError(
                    "grad_accum > 1 requires matching supervised/"
                    f"unsupervised crop shapes, got {batch['sup_x'].shape[1:]}"
                    f" vs {x_stu_cons.shape[1:]}")
            if cfg.mask_mode == "mix":
                scan_in["tea0"] = chunk(batch["ux0_tea"])
                scan_in["tea1"] = chunk(batch["ux1_tea"])
            else:  # 'zero'
                scan_in["tea_in"] = chunk(batch["ux_tea"])
            scan_in["m"] = chunk(m.astype(jnp.float32))
            scan_in["x_cons"] = chunk(x_stu_cons)
            scan_in["loss_mask"] = chunk(loss_mask.astype(jnp.float32))

        def one_chunk(stu_stats, tea_stats, inp):
            i = inp["i"]
            k_tea = jax.random.fold_in(k_drop_tea, i)
            conf_px = logits_tea = None
            if use_cons:
                if cfg.mask_mode == "mix":
                    nc = inp["x_cons"].shape[0]
                    if cfg.freeze_bn:
                        # frozen BN: one concatenated forward (identical math)
                        tea_out, tea_stats = apply_model(
                            model, tea_state.params, tea_stats,
                            jnp.concatenate([inp["tea0"], inp["tea1"]]),
                            train=True, freeze_bn=True, rng=k_tea)
                        tea0, tea1 = tea_out[:nc], tea_out[nc:]
                    else:
                        # training BN: the reference's two sequential passes,
                        # stats threading chunk to chunk through the carry
                        tea0, tea_stats = apply_model(
                            model, tea_state.params, tea_stats, inp["tea0"],
                            train=True, freeze_bn=False, rng=k_tea)
                        tea1, tea_stats = apply_model(
                            model, tea_state.params, tea_stats, inp["tea1"],
                            train=True, freeze_bn=False,
                            rng=jax.random.fold_in(k_tea, 1))
                    tea0 = jax.lax.stop_gradient(tea0.astype(jnp.float32))
                    tea1 = jax.lax.stop_gradient(tea1.astype(jnp.float32))
                    logits_tea = tea0 * (1.0 - inp["m"]) + tea1 * inp["m"]
                else:
                    logits_tea, tea_stats = apply_model(
                        model, tea_state.params, tea_stats, inp["tea_in"],
                        train=True, freeze_bn=cfg.freeze_bn, rng=k_tea)
                    logits_tea = jax.lax.stop_gradient(
                        logits_tea.astype(jnp.float32))
                prob_tea = jax.nn.softmax(logits_tea, axis=-1)
                conf_px = confidence_px(
                    cfg, prob_tea.max(axis=-1, keepdims=True))

            def loss_fn(params):
                metrics = {}
                if use_cons and cfg.freeze_bn:
                    ns = inp["sup_x"].shape[0]
                    logits_all, stats = apply_model(
                        model, params, stu_stats,
                        jnp.concatenate([inp["sup_x"], inp["x_cons"]]),
                        train=True, freeze_bn=True,
                        rng=jax.random.fold_in(k_drop_sup, i))
                    logits_sup, logits_stu = logits_all[:ns], logits_all[ns:]
                else:
                    logits_sup, stats = apply_model(
                        model, params, stu_stats,
                        inp["sup_x"], train=True, freeze_bn=cfg.freeze_bn,
                        rng=jax.random.fold_in(k_drop_sup, i))
                    logits_stu = None
                sup_loss = L.cross_entropy_ignore(
                    logits_sup, inp["sup_y"], cfg.ignore_value)
                metrics["sup_loss"] = sup_loss
                total = sup_loss
                if use_cons:
                    if logits_stu is None:
                        logits_stu, stats = apply_model(
                            model, params, stats, inp["x_cons"],
                            train=True, freeze_bn=cfg.freeze_bn,
                            rng=jax.random.fold_in(k_drop_uns, i))
                    per_px = L.consistency_loss_per_pixel(
                        cfg.cons_loss_fn, logits_stu, logits_tea)
                    loss_sum, loss_mean, conf_rate = masked_consistency(
                        cfg, per_px, inp["loss_mask"], conf_px)
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
