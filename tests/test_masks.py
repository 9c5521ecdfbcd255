"""Box-mask tests: scripted-RNG parity of the NumPy sampler with the reference
semantics, rasterisation correctness, and distribution checks on the JAX path."""

import numpy as np
import jax
import jax.numpy as jnp

from cutmix_seg_tpu.masks import (
    BoxMaskConfig,
    rasterise_masks,
    sample_box_rects,
    sample_box_rects_np,
    sample_masks,
)


def _np_reference_masks(cfg, n, hw, rng):
    """Independent NumPy rasterisation of the documented semantics (loop form)
    to validate the vectorised device rasteriser."""
    rects = sample_box_rects_np(cfg, n, hw, rng)
    masks = np.full((n,) + hw, 0.0 if cfg.invert else 1.0)
    for i, sample_rects in enumerate(rects):
        for y0, x0, y1, x1 in sample_rects:
            masks[i, int(y0):int(y1), int(x0):int(x1)] = (
                1 - masks[i, int(y0):int(y1), int(x0):int(x1)]
            )
    return rects, masks


def test_rasterise_matches_loop_reference():
    cfg = BoxMaskConfig.from_prop((0.25, 0.5), n_boxes=3)
    rng = np.random.RandomState(123)
    rects, ref_masks = _np_reference_masks(cfg, 16, (32, 48), rng)
    ours = np.asarray(rasterise_masks(jnp.asarray(rects), (32, 48), invert=cfg.invert))
    np.testing.assert_array_equal(ours[..., 0], ref_masks)


def test_rasterise_outside_bounds():
    cfg = BoxMaskConfig.from_prop(0.5, within_bounds=False)
    rng = np.random.RandomState(7)
    rects, ref_masks = _np_reference_masks(cfg, 32, (24, 24), rng)
    ours = np.asarray(rasterise_masks(jnp.asarray(rects), (24, 24), invert=cfg.invert))
    np.testing.assert_array_equal(ours[..., 0], ref_masks)


def test_scripted_rng_exact_box():
    """With a scripted RNG the rect must land exactly where the math says."""

    class ScriptedRNG:
        def __init__(self, seq):
            self.seq = list(seq)

        def uniform(self, low=0.0, high=1.0, size=None):
            v = self.seq.pop(0)
            arr = np.full(size, v)
            return low + (high - low) * arr if not np.isscalar(arr) else v

    cfg = BoxMaskConfig.from_prop(0.25)  # fixed prop = 0.25
    # draws: mask_props (=0.25), aspect u (0.5 -> y = 0.25^0.5 = 0.5, x = 0.5),
    # position u (0.0 -> top-left)
    rng = ScriptedRNG([0.0, 0.5, 0.0])
    rects = sample_box_rects_np(cfg, 1, (100, 100), rng)
    # y_prop = exp(0.5 * ln 0.25) = 0.5 -> size 50; x_prop = 0.25/0.5 = 0.5 -> 50
    np.testing.assert_allclose(rects[0, 0], [0, 0, 50, 50])


def test_area_proportion_jax():
    """prop_by_area: mean mask area must approximate the prop range midpoint."""
    cfg = BoxMaskConfig.from_prop(0.5)
    masks = sample_masks(cfg, jax.random.PRNGKey(0), 256, (64, 64))
    area = float(jnp.mean(masks))
    assert abs(area - 0.5) < 0.02, area


def test_jax_rects_in_bounds():
    cfg = BoxMaskConfig.from_prop((0.3, 0.7))
    rects = sample_box_rects(cfg, jax.random.PRNGKey(1), 128, (40, 60))
    r = np.asarray(rects)
    assert (r[:, :, 0] >= 0).all() and (r[:, :, 1] >= 0).all()
    assert (r[:, :, 2] <= 40).all() and (r[:, :, 3] <= 60).all()
    assert (r[:, :, 2] >= r[:, :, 0]).all() and (r[:, :, 3] >= r[:, :, 1]).all()


def test_cutmix_mix_uses_mask():
    """x_mix = x0 * (1 - m) + x1 * m with a hard mask picks pixels exactly."""
    cfg = BoxMaskConfig.from_prop(0.25)
    m = sample_masks(cfg, jax.random.PRNGKey(2), 4, (32, 32))
    x0 = jnp.zeros((4, 32, 32, 3))
    x1 = jnp.ones((4, 32, 32, 3))
    mix = x0 * (1 - m) + x1 * m
    np.testing.assert_array_equal(np.asarray(mix[..., 0]), np.asarray(m[..., 0]))
