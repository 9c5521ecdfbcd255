"""Consistency-loss menu, confidence thresholding and supervised CE.

The loss functions mirror the reference trainer's inlined menu
(reference: train_seg_semisup_mask_mt.py:428-448) but are pure jnp functions
over NHWC logits so they fuse into the single train-step XLA program.

Class-dimension aggregation follows the reference exactly: sum over classes
(keeps grad magnitude roughly class-count invariant), with logit-space losses
divided by sqrt(num_classes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS_BCE = 1e-6


def cross_entropy_ignore(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_value: int = 255,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Mean softmax cross-entropy over non-ignored pixels.

    Matches torch nn.CrossEntropyLoss(ignore_index=255) semantics: the mean is
    taken over valid pixels only (reference: train_seg_semisup_mask_mt.py:126,300).

    ``compute_dtype`` is the dtype of the log-softmax chain (the full
    (N,H,W,C)-scale tensors); the masked pixel sum always accumulates in
    f32. bfloat16 halves the chain's HBM width (--loss_softmax_dtype).

    :param logits: (N, H, W, C) float
    :param labels: (N, H, W) int
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_value
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(compute_dtype), axis=-1)
    # Select logp[label] as a one-hot masked sum over the minor (class) dim
    # rather than take_along_axis: XLA lowers the gather to a ~1.5 GB/s
    # "custom fusion" on TPU (measured 13.8 ms/step = 11% of device-busy at
    # the paper recipe, results_evidence/op_breakdown/), while the where+sum
    # fuses into the log-softmax chain as elementwise+minor-dim reduce. The
    # sum picks exactly one nonzero element among zeros, so the value (and
    # the softmax-minus-onehot backward) is bit-identical to the gather.
    class_iota = jax.lax.broadcasted_iota(
        jnp.int32, logp.shape, len(logp.shape) - 1)
    picked = jnp.where(
        class_iota == safe_labels[..., None], logp, 0).sum(
            axis=-1).astype(jnp.float32)
    losses = jnp.where(valid, -picked, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return losses.sum() / denom


def robust_binary_crossentropy(pred, tgt, eps: float = EPS_BCE):
    """Elementwise BCE with epsilon guards (reference: network_architectures.py:115-118)."""
    inv_tgt = 1.0 - tgt
    inv_pred = 1.0 - pred + eps
    return -(tgt * jnp.log(pred + eps) + inv_tgt * jnp.log(inv_pred))


def consistency_loss_per_pixel(
    loss_fn: str,
    logits_stu: jnp.ndarray,
    logits_tea: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Per-pixel consistency loss (N, H, W, 1), class dim aggregated.

    loss_fn: 'var' | 'logits_var' | 'logits_smoothl1' | 'bce' | 'kld'

    ``compute_dtype`` is the dtype of the softmax/difference chain (the
    (N,H,W,C)-scale tensors); the per-pixel class sum is returned in f32 so
    downstream masked means always accumulate full-width
    (--loss_softmax_dtype bfloat16 halves the chain's HBM width).
    """
    num_classes = logits_stu.shape[-1]
    root_c = jnp.sqrt(jnp.float32(num_classes)).astype(compute_dtype)
    logits_stu = logits_stu.astype(compute_dtype)
    logits_tea = logits_tea.astype(compute_dtype)

    def f32(x):
        return x.astype(jnp.float32)

    if loss_fn == "var":
        d = jax.nn.softmax(logits_stu, axis=-1) - jax.nn.softmax(logits_tea, axis=-1)
        return f32((d * d).sum(axis=-1, keepdims=True))
    if loss_fn == "logits_var":
        d = logits_stu - logits_tea
        return f32((d * d).sum(axis=-1, keepdims=True) / root_c)
    if loss_fn == "logits_smoothl1":
        d = jnp.abs(logits_stu - logits_tea)
        l = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
        return f32(l.sum(axis=-1, keepdims=True) / root_c)
    if loss_fn == "bce":
        p_stu = jax.nn.softmax(logits_stu, axis=-1)
        p_tea = jax.nn.softmax(logits_tea, axis=-1)
        return f32(robust_binary_crossentropy(p_stu, p_tea).sum(
            axis=-1, keepdims=True))
    if loss_fn == "kld":
        logp_stu = jax.nn.log_softmax(logits_stu, axis=-1)
        p_tea = jax.nn.softmax(logits_tea, axis=-1)
        logp_tea = jax.nn.log_softmax(logits_tea, axis=-1)
        # KL(p_tea || p_stu) elementwise as torch F.kl_div(input=logp_stu, target=p_tea)
        return f32((p_tea * (logp_tea - logp_stu)).sum(axis=-1, keepdims=True))
    raise ValueError(f"unknown consistency loss {loss_fn!r}")


def consistency_from_prob_targets(
    loss_fn: str,
    logits_stu: jnp.ndarray,
    logits_tea: jnp.ndarray,
    prob_tea: jnp.ndarray,
) -> jnp.ndarray:
    """Per-pixel consistency loss against PRE-COMPUTED teacher prob targets.

    For algorithms whose teacher target is not softmax(logits_tea) — ICT
    blends probs across the mixup pair (reference: ict.py:360-378), aug_mt
    warps teacher probs into student space — prob-space losses (var/bce/kld)
    take ``prob_tea`` as the target while logit-space losses
    (logits_var/logits_smoothl1) use ``logits_tea``. Shared by the ICT and
    aug_mt K=1 and grad-accum steps.
    """
    if loss_fn == "var":
        d = jax.nn.softmax(logits_stu, axis=-1) - prob_tea
        return (d * d).sum(axis=-1, keepdims=True)
    if loss_fn in ("logits_var", "logits_smoothl1"):
        return consistency_loss_per_pixel(loss_fn, logits_stu, logits_tea)
    if loss_fn == "bce":
        return robust_binary_crossentropy(
            jax.nn.softmax(logits_stu, axis=-1), prob_tea
        ).sum(axis=-1, keepdims=True)
    if loss_fn == "kld":
        logp_stu = jax.nn.log_softmax(logits_stu, axis=-1)
        safe_p = jnp.maximum(prob_tea, 1e-20)
        return (prob_tea * (jnp.log(safe_p) - logp_stu)).sum(
            axis=-1, keepdims=True)
    raise ValueError(f"unknown consistency loss {loss_fn!r}")


def confidence_mask(
    prob_tea: jnp.ndarray, conf_thresh: float, per_pixel: bool
):
    """Teacher-confidence gating (reference: train_seg_semisup_mask_mt.py:404-420).

    :param prob_tea: (N, H, W, C) teacher probabilities
    :return: (mask, conf_rate) — mask is (N, H, W, 1) if per_pixel else a
        scalar (the mean confidence rate); conf_rate is the scalar mean of the
        per-pixel mask either way (for reporting).
    """
    conf = prob_tea.max(axis=-1, keepdims=True)
    m = (conf >= conf_thresh).astype(jnp.float32)
    rate = m.mean()
    if per_pixel:
        return m, rate
    return rate, rate
