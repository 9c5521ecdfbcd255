"""Multi-seed vmap training tests: per-seed independence, exact equivalence
with single-seed runs, and seed-axis sharding over the CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cutmix_seg_tpu.core.schedules import make_lr_schedule
from cutmix_seg_tpu.core.train_state import OptimizerConfig, create_train_state
from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig
from cutmix_seg_tpu.parallel.mesh import make_mesh
from cutmix_seg_tpu.parallel.multi_seed import (
    make_multi_seed_step,
    stack_pytrees,
    stack_states,
    unstack_state,
)
from cutmix_seg_tpu.semisup.mask_mt import MaskConsistencyConfig, make_mask_mt_step

from tests.test_train_step import make_batch, tiny_model


pytestmark = pytest.mark.slow  # full e2e runs; quick bar: -m "not slow"

def _setup(k_seeds=4):
    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-4,
        lr_schedule=make_lr_schedule("none", 3e-4, 100))
    cfg = MaskConsistencyConfig(
        mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)), cons_weight=1.0,
        conf_thresh=0.0, freeze_bn=True, mean_teacher=True, teacher_alpha=0.9)
    states = []
    for k in range(k_seeds):
        s, tx = create_train_state(model, opt_cfg, jax.random.PRNGKey(100 + k),
                                   input_hw=(33, 33), mean_teacher=True,
                                   pretrained=False)
        states.append(s)
    step = make_mask_mt_step(model, tx, cfg)
    return model, states, step


def test_multi_seed_matches_single_seed():
    K = 4
    model, states, step = _setup(K)
    rng = np.random.RandomState(0)
    batches = [make_batch(np.random.RandomState(10 + k), b=4) for k in range(K)]

    mesh = make_mesh(4)
    mstate = stack_states(states)
    mbatch = stack_pytrees(batches)
    mstep = make_multi_seed_step(step, mesh)
    mstate2, metrics = mstep(mstate, mbatch, jnp.float32(1.0))

    assert np.asarray(metrics["sup_loss"]).shape == (K,)
    assert np.isfinite(np.asarray(metrics["sup_loss"])).all()

    # exact equivalence: seed 2 via vmap == seed 2 run alone
    s2, m2 = step(states[2], batches[2], jnp.float32(1.0))
    got = unstack_state(mstate2, 2)
    ref_leaf = np.asarray(s2.student.params["classifier"]["aspp0"]["kernel"])
    got_leaf = np.asarray(got.student.params["classifier"]["aspp0"]["kernel"])
    # vmap changes conv reduction order; Adam amplifies near-zero-gradient
    # sign flips to +-lr, so parameters agree to ~2*lr and losses to fp32 eps
    np.testing.assert_allclose(got_leaf, ref_leaf, atol=7e-4)
    assert abs(float(m2["sup_loss"]) - float(metrics["sup_loss"][2])) < 1e-4

    # seeds actually differ from one another (frozen BN leaves are identical,
    # so compare a trained leaf)
    l0 = np.asarray(
        unstack_state(mstate2, 0).student.params["classifier"]["aspp0"]["kernel"])
    assert not np.allclose(l0, got_leaf)


def test_multi_seed_multiple_steps_progress():
    K = 2
    model, states, step = _setup(K)
    mesh = make_mesh(2)
    mstate = stack_states(states)
    mstep = make_multi_seed_step(step, mesh)
    batches = [make_batch(np.random.RandomState(20 + k), b=4) for k in range(K)]
    mbatch = stack_pytrees(batches)
    losses = []
    for _ in range(4):
        mstate, metrics = mstep(mstate, mbatch, jnp.float32(1.0))
        losses.append(np.asarray(metrics["sup_loss"]))
    losses = np.stack(losses)
    assert (losses[-1] < losses[0]).all()  # every seed learns its batch
    assert int(np.asarray(unstack_state(mstate, 0).step)) == 4


def test_multiseed_trainer_rejects_unwired_flags():
    """The multi-seed CLI shares common_options, so it parses grad_accum /
    spatial_train — neither is wired through the vmapped program; they must
    be rejected loudly, not parsed-and-ignored. (--resume IS supported.)"""
    from cutmix_seg_tpu.core.job import RunContext
    from cutmix_seg_tpu.train.multi_seed_mask_mt import (
        train_seg_semisup_mask_mt_multiseed,
    )

    ctx = RunContext("/tmp/unused_mseed_guard", "guard")
    for bad in ({"grad_accum": 2}, {"spatial_train": 2}):
        with pytest.raises(ValueError, match="not supported"):
            train_seg_semisup_mask_mt_multiseed(ctx, **bad)
