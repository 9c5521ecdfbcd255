"""Pallas CutMix kernel tests (interpret mode on CPU): parity with the jnp
rasterise + blend path, standalone and shard_mapped over the 8-device mesh
inside the sharded train step."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cutmix_seg_tpu.masks.box_mask import (
    BoxMaskConfig,
    rasterise_masks,
    sample_box_rects,
)
from cutmix_seg_tpu.ops.pallas_cutmix import cutmix_blend, cutmix_blend_sharded


def test_cutmix_blend_matches_jnp_path():
    rng = np.random.RandomState(0)
    n, h, w, c = 4, 64, 64, 3
    x0 = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    x1 = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    cfg = BoxMaskConfig((0.25, 0.75), n_boxes=2)
    rects = sample_box_rects(cfg, jax.random.PRNGKey(0), n, (h, w))

    m_ref = rasterise_masks(rects, (h, w), invert=True)
    mix_ref = x0 * (1 - m_ref) + x1 * m_ref

    mix, m = cutmix_blend(x0, x1, rects, invert=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
    np.testing.assert_allclose(np.asarray(mix), np.asarray(mix_ref), atol=1e-6)


def test_cutmix_blend_sharded_matches_unsharded():
    """shard_map over the 8-device data axis must be bit-equal to the
    single-device kernel (it is batch-parallel with no cross-shard reads)."""
    from cutmix_seg_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    rng = np.random.RandomState(2)
    n, h, w, c = 16, 32, 32, 3
    x0 = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    x1 = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    cfg = BoxMaskConfig((0.25, 0.75), n_boxes=2)
    rects = sample_box_rects(cfg, jax.random.PRNGKey(2), n, (h, w))

    mix_ref, m_ref = cutmix_blend(x0, x1, rects, invert=True, interpret=True)

    sh = batch_sharding(mesh)
    args = [jax.device_put(a, sh) for a in (x0, x1, rects)]
    f = jax.jit(lambda a, b, r: cutmix_blend_sharded(
        a, b, r, invert=True, mesh=mesh, interpret=True))
    mix, m = f(*args)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(mix), np.asarray(mix_ref))


@pytest.mark.slow
def test_mask_mt_step_pallas_on_sharded_matches_jnp_path():
    """mask_mt with pallas_cutmix='on' inside jit_sharded_step on the 8-device
    mesh must produce the same training trajectory as the jnp path (the mask
    rasterisations are bit-equal, so losses and updates match)."""
    from cutmix_seg_tpu.parallel.mesh import jit_sharded_step, make_mesh, shard_batch
    from tests.test_train_step import _setup, make_batch

    mesh = make_mesh()
    model, state0, _ = _setup("mix")

    results = {}
    for pallas in ("on", "off"):
        from cutmix_seg_tpu.core.schedules import make_lr_schedule
        from cutmix_seg_tpu.core.train_state import OptimizerConfig, create_train_state
        from cutmix_seg_tpu.semisup.mask_mt import (
            MaskConsistencyConfig,
            make_mask_mt_step,
        )

        opt_cfg = OptimizerConfig(opt_type="adam", learning_rate=3e-4,
                                  lr_schedule=make_lr_schedule("none", 3e-4, 100))
        state, tx = create_train_state(model, opt_cfg, jax.random.PRNGKey(0),
                                       input_hw=(33, 33), mean_teacher=True,
                                       pretrained=False)
        cfg = MaskConsistencyConfig(
            mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)), cons_weight=1.0,
            conf_thresh=0.5, freeze_bn=True, mean_teacher=True,
            pallas_cutmix=pallas)
        step = jit_sharded_step(
            make_mask_mt_step(model, tx, cfg, mesh=mesh), mesh)
        rng = np.random.RandomState(3)
        batch = shard_batch(mesh, make_batch(rng, b=8, hw=(32, 32)))
        for _ in range(2):
            state, metrics = step(state, batch, jnp.float32(1.0))
        results[pallas] = (
            float(metrics["sup_loss"]), float(metrics["cons_loss"]),
            np.asarray(state.student.params["classifier"]["aspp0"]["kernel"]))

    assert results["on"][0] == results["off"][0]
    np.testing.assert_allclose(results["on"][1], results["off"][1],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(results["on"][2], results["off"][2],
                               rtol=1e-5, atol=1e-7)


def test_cutmix_blend_no_invert_odd_height():
    rng = np.random.RandomState(1)
    n, h, w, c = 2, 33, 48, 1  # odd height -> single-tile fallback
    x0 = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    x1 = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    cfg = BoxMaskConfig((0.5, 0.5), invert=False)
    rects = sample_box_rects(cfg, jax.random.PRNGKey(1), n, (h, w))

    m_ref = rasterise_masks(rects, (h, w), invert=False)
    mix_ref = x0 * (1 - m_ref) + x1 * m_ref
    mix, m = cutmix_blend(x0, x1, rects, invert=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
    np.testing.assert_allclose(np.asarray(mix), np.asarray(mix_ref), atol=1e-6)
