"""Tests for the ICT, VAT and augmentation-consistency fused steps, plus
semantic checks against hand-computed / reference-derived expectations."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cutmix_seg_tpu.core.schedules import make_lr_schedule
from cutmix_seg_tpu.core.train_state import OptimizerConfig, create_train_state
from cutmix_seg_tpu.semisup.aug_cons import AugConsConfig, make_aug_cons_step
from cutmix_seg_tpu.semisup.ict import ICTConfig, make_ict_step
from cutmix_seg_tpu.semisup.vat import (
    VATConfig,
    _normalize_per_sample,
    _vat_sum_loss,
    make_vat_step,
)

from tests.test_train_step import make_batch, tiny_model


def _setup(make_step_fn, cfg):
    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-4,
        lr_schedule=make_lr_schedule("none", 3e-4, 100))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=cfg.mean_teacher, pretrained=False)
    return model, state, make_step_fn(model, tx, cfg)


@pytest.mark.slow
def test_ict_step_runs_and_learns():
    cfg = ICTConfig(ict_alpha=0.1, conf_thresh=0.97)
    model, state, step = _setup(make_ict_step, cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)  # same keys as mask_mt mix mode
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, jnp.float32(1.0))
        losses.append(float(metrics["sup_loss"]))
        assert np.isfinite(float(metrics["cons_loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_ict_prob_mixing_semantics():
    """For a Beta(0.1, 0.1) draw, lambda is per-sample — masked blend means
    the mixed teacher probs are a convex combination, hence in [0, 1] and
    normalised per pixel."""
    cfg = ICTConfig(ict_alpha=0.1, conf_thresh=0.0)
    model, state, step = _setup(make_ict_step, cfg)
    rng = np.random.RandomState(1)
    state2, metrics = step(state, make_batch(rng), jnp.float32(1.0))
    assert np.isfinite(float(metrics["cons_loss"]))


def test_vat_direction_math():
    # per-sample normalisation
    x = jnp.asarray(np.random.RandomState(0).randn(3, 4, 4, 2).astype(np.float32))
    n = _normalize_per_sample(x)
    mags = np.asarray(jnp.sqrt((n.reshape(3, -1) ** 2).sum(axis=1)))
    np.testing.assert_allclose(mags, 1.0, atol=1e-5)

    # summed var loss equals manual computation
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(2, 3, 3, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 3, 3, 4).astype(np.float32))
    got = float(_vat_sum_loss("var", a, b))
    pa = np.asarray(jax.nn.softmax(a, axis=-1))
    pb = np.asarray(jax.nn.softmax(b, axis=-1))
    np.testing.assert_allclose(got, ((pa - pb) ** 2).sum(), rtol=1e-5)


@pytest.mark.slow
def test_vat_step_runs_fixed_and_adaptive():
    for adaptive in (False, True):
        cfg = VATConfig(vat_radius=0.5, adaptive_vat_radius=adaptive,
                        conf_thresh=0.97)
        model, state, step = _setup(make_vat_step, cfg)
        rng = np.random.RandomState(2)
        batch = make_batch(rng, mode="zero")  # ux_tea/ux_stu/um keys
        state2, metrics = step(state, batch, jnp.float32(1.0))
        assert np.isfinite(float(metrics["sup_loss"]))
        assert np.isfinite(float(metrics["cons_loss"])), f"adaptive={adaptive}"


@pytest.mark.slow
def test_vat_dir_from_student():
    cfg = VATConfig(vat_radius=0.5, vat_dir_from_student=True, conf_thresh=0.0)
    model, state, step = _setup(make_vat_step, cfg)
    rng = np.random.RandomState(3)
    state2, metrics = step(state, make_batch(rng, mode="zero"), jnp.float32(1.0))
    assert np.isfinite(float(metrics["cons_loss"]))


def _aug_batch(rng, b=4, hw=(33, 33), C=4):
    from cutmix_seg_tpu.aug import affine

    h, w = hw
    batch = {
        "sup_x": jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        "sup_y": jnp.asarray(rng.randint(0, C, size=(b, h, w)).astype(np.int32)),
        "ux0": jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        "ux1": jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        "um0": jnp.ones((b, h, w, 1), jnp.float32),
        "um1": jnp.ones((b, h, w, 1), jnp.float32),
    }
    # small relative shifts between the pair elements
    m_cv = affine.translation(rng.uniform(-3, 3, size=(b, 2)).astype(np.float32))
    batch["xf0_to_1"] = jnp.asarray(affine.cv_to_grid(m_cv, hw).astype(np.float32))
    return batch


@pytest.mark.slow
def test_aug_cons_step_runs():
    cfg = AugConsConfig(conf_thresh=0.97)
    model, state, step = _setup(make_aug_cons_step, cfg)
    rng = np.random.RandomState(4)
    state2, metrics = step(state, _aug_batch(rng), jnp.float32(1.0))
    assert np.isfinite(float(metrics["sup_loss"]))
    assert np.isfinite(float(metrics["cons_loss"]))
    assert 0.0 <= float(metrics["conf_rate"]) <= 1.0


@pytest.mark.slow
def test_aug_cons_identity_xf_zero_loss_same_images():
    """With identical pair elements and an identity relative transform, the
    teacher-in-student-frame logits equal the teacher logits, so the 'var'
    loss between teacher and a freshly-EMA-initialised student (identical
    nets) must be ~0."""
    from cutmix_seg_tpu.aug import affine

    cfg = AugConsConfig(conf_thresh=0.0, cons_loss_fn="var")
    model, state, step = _setup(make_aug_cons_step, cfg)
    rng = np.random.RandomState(5)
    b, h, w = 4, 33, 33
    x = rng.randn(b, h, w, 3).astype(np.float32)
    batch = {
        "sup_x": jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        "sup_y": jnp.asarray(rng.randint(0, 4, size=(b, h, w)).astype(np.int32)),
        "ux0": jnp.asarray(x),
        "ux1": jnp.asarray(x),
        "um0": jnp.ones((b, h, w, 1), jnp.float32),
        "um1": jnp.ones((b, h, w, 1), jnp.float32),
        "xf0_to_1": jnp.asarray(
            affine.cv_to_grid(affine.identity(b), (h, w)).astype(np.float32)),
    }
    _, metrics = step(state, batch, jnp.float32(1.0))
    assert float(metrics["cons_loss"]) < 1e-8


def test_masked_consistency_subbatch_semantics():
    """R folded sub-batches: loss_sum must equal the sum of per-sub-batch
    means of (per_px * mask), matching the reference's separate backwards."""
    import jax.numpy as jnp

    from cutmix_seg_tpu.semisup.stepcore import ConsistencyCommon, masked_consistency

    rng = np.random.RandomState(0)
    R, B, H, W = 3, 2, 4, 4
    per_px = jnp.asarray(rng.uniform(size=(R * B, H, W, 1)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(R * B, H, W, 1)) > 0.3).astype(np.float32))

    cfg = ConsistencyCommon(conf_thresh=0.0, unsup_batch_ratio=R)
    loss_sum, loss_mean, conf_rate = masked_consistency(cfg, per_px, mask, None)

    ref = np.asarray(per_px * mask).reshape(R, -1).mean(axis=1)
    assert abs(float(loss_sum) - ref.sum()) < 1e-6
    assert abs(float(loss_mean) - ref.mean()) < 1e-6
    assert float(conf_rate) == 1.0

    # batch-mean confidence gating is PER sub-batch
    conf_px = jnp.asarray((rng.uniform(size=(R * B, H, W, 1)) > 0.5)
                          .astype(np.float32))
    cfg2 = ConsistencyCommon(conf_thresh=0.9, conf_per_pixel=False,
                             unsup_batch_ratio=R)
    loss_sum2, _, rate2 = masked_consistency(cfg2, per_px, mask, conf_px)
    rates = np.asarray(conf_px).reshape(R, -1).mean(axis=1)
    ref2 = (np.asarray(per_px * mask).reshape(R, -1).mean(axis=1) * rates).sum()
    assert abs(float(loss_sum2) - ref2) < 1e-6
    assert abs(float(rate2) - rates.mean()) < 1e-6


@pytest.mark.slow
def test_mask_mt_step_unsup_batch_ratio_2():
    from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig
    from cutmix_seg_tpu.core.train_state import OptimizerConfig, create_train_state
    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.semisup.mask_mt import (
        MaskConsistencyConfig, make_mask_mt_step)

    model = tiny_model()
    opt_cfg = OptimizerConfig(opt_type="adam", learning_rate=3e-4,
                              lr_schedule=make_lr_schedule("none", 3e-4, 100))
    state, tx = create_train_state(model, opt_cfg, jax.random.PRNGKey(0),
                                   input_hw=(33, 33), mean_teacher=True,
                                   pretrained=False)
    cfg = MaskConsistencyConfig(mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)),
                                cons_weight=1.0, conf_thresh=0.97,
                                freeze_bn=True, mean_teacher=True,
                                unsup_batch_ratio=2)
    step = make_mask_mt_step(model, tx, cfg)

    rng = np.random.RandomState(0)
    batch = make_batch(rng, b=4)  # sup batch of 4
    # unsup arrays need leading dim R*B = 8
    ext = make_batch(rng, b=8)
    for k in ("ux0_tea", "ux0_stu", "um0", "ux1_tea", "ux1_stu", "um1"):
        batch[k] = ext[k]
    state2, metrics = step(state, batch, jnp.float32(1.0))
    assert np.isfinite(float(metrics["sup_loss"]))
    assert np.isfinite(float(metrics["cons_loss"]))


def test_synthetic_benchmark_aug_pair_geometry_aligns():
    """The aug_mt convergence harness's translated-crop pair transform must
    map the teacher view onto the student view: warping crop0 by xf0_to_1
    reproduces crop1 exactly on the overlap interior (the evidence in
    results_evidence/algo_convergence/ rests on this alignment)."""
    from cutmix_seg_tpu.ops.resample import grid_sample_affine
    from cutmix_seg_tpu.tools.synthetic_benchmark import (
        _AUG_MARGIN,
        _aug_pair_batch,
    )

    rng = np.random.RandomState(0)
    src = rng.rand(5, 64 + _AUG_MARGIN, 64 + _AUG_MARGIN, 3).astype(np.float32)
    x0, x1, xf = _aug_pair_batch(src, np.arange(5), np.random.RandomState(1),
                                 (64, 64))
    warped = np.asarray(grid_sample_affine(
        jnp.asarray(x0), jnp.asarray(xf), (64, 64)))
    m = _AUG_MARGIN
    err = np.abs(warped[:, m:-m, m:-m] - x1[:, m:-m, m:-m]).max()
    assert err < 1e-4, err


@pytest.mark.slow
def test_synthetic_benchmark_all_algorithms_run():
    """Each algorithm path of the convergence harness executes (tiny iters)
    and returns a finite mIoU with identical sup/val draws across
    algorithms."""
    from cutmix_seg_tpu.tools.synthetic_benchmark import run

    mious = {}
    for algo in ("mask_mt", "cutout", "ict", "vat_mt", "aug_mt"):
        miou, loss = run(iters=2, n_sup=4, n_unsup=8, n_val=8, batch=4,
                         algorithm=algo)
        assert np.isfinite(loss), algo
        mious[algo] = miou
    # identical val sets + 2 iters of barely-different training: mious close
    assert max(mious.values()) - min(mious.values()) < 0.2, mious
