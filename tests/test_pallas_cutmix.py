"""Pallas CutMix kernel tests (interpret mode on CPU): parity with the jnp
rasterise + blend path."""

import numpy as np
import jax
import jax.numpy as jnp

from cutmix_seg_tpu.masks.box_mask import (
    BoxMaskConfig,
    rasterise_masks,
    sample_box_rects,
)
from cutmix_seg_tpu.ops.pallas_cutmix import cutmix_blend


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
