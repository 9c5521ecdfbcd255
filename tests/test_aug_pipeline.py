"""On-device augmentation pipeline tests.

Strategy mirrors the reference test suite's load-bearing ideas
(/root/reference/tests/test_data_pipeline.py docstring): scripted-RNG
pixel-exact transform checks, plus dual-path warp equivalence — here the
jitted canvas warp is compared against an independent NumPy reference warp and
against pure-array slicing for crop-only transforms.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cutmix_seg_tpu.aug import affine
from cutmix_seg_tpu.aug.device import (
    augment_batch,
    warp_image_canvas,
    warp_labels_canvas,
)
from cutmix_seg_tpu.aug.params import GeomConfig, sample_geom_pair, sample_geom_single
from cutmix_seg_tpu.ops.colour import ColourJitterConfig, colour_jitter


class ScriptedRNG:
    """Deterministic stand-in for np.random.RandomState."""

    def __init__(self, uniform_vals=(), randint_vals=(), binomial_vals=(),
                 choice_vals=()):
        self.u = list(uniform_vals)
        self.r = list(randint_vals)
        self.b = list(binomial_vals)
        self.c = list(choice_vals)

    def uniform(self, low=0.0, high=1.0, size=None):
        v = np.asarray(self.u.pop(0), dtype=np.float64)
        v = np.broadcast_to(v, size if size is not None else ()).copy()
        return low + (high - low) * v

    def randint(self, low, high, size=None):
        v = np.asarray(self.r.pop(0))
        return np.broadcast_to(v, size if size is not None else ()).copy()

    def binomial(self, n, p, size=None):
        v = np.asarray(self.b.pop(0))
        return np.broadcast_to(v, size if size is not None else ()).copy()

    def choice(self, opts):
        return self.c.pop(0)


def _canvas_from(img, canvas_hw):
    h, w = img.shape[:2]
    canvas = np.zeros(canvas_hw + (3,), np.uint8)
    canvas[:h, :w] = img
    return canvas


def test_crop_param_matrix_scripted():
    cfg = GeomConfig(crop_size=(50, 60), mode="crop")
    # image 100x120, extra = (50, 60); uniform 0.5 -> pos (25, 30)
    rng = ScriptedRNG(uniform_vals=[0.5])
    m, interp = sample_geom_single(cfg, (100, 120), rng, has_labels=True)
    np.testing.assert_allclose(m, [[1, 0, -30], [0, 1, -25]], atol=1e-6)
    assert interp == 1


def test_crop_pad_centres_small_image():
    cfg = GeomConfig(crop_size=(50, 60), mode="crop")
    # image 30x20: pad to (50, 60), offsets (10, 20); pos = 0
    rng = ScriptedRNG(uniform_vals=[0.0])
    m, _ = sample_geom_single(cfg, (30, 20), rng, has_labels=True)
    np.testing.assert_allclose(m, [[1, 0, 20], [0, 1, 10]], atol=1e-6)


def test_crop_warp_matches_slicing():
    """A pure-crop matrix through the device warp must equal array slicing."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(80, 90, 3), dtype=np.uint8)
    canvas = _canvas_from(img, (96, 96))
    m = affine.translation(np.array([[-12.0, -7.0]]))  # crop at y=7, x=12
    crop, valid = warp_image_canvas(
        jnp.asarray(canvas[None]),
        jnp.asarray(m.astype(np.float32)),
        jnp.asarray([[80, 90]], np.int32),
        jnp.asarray([1], np.int32),
        (40, 50),
    )
    np.testing.assert_allclose(
        np.asarray(crop[0]), img[7:47, 12:62].astype(np.float32), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(valid[0, ..., 0]), 1.0)


def test_hung_scale_param_matrix_scripted():
    cfg = GeomConfig(crop_size=(100, 100), mode="crop_scale_hung")
    # randint 5 -> f = 1.0 -> sc = 100 (identity scale); pos u=0.25
    rng = ScriptedRNG(randint_vals=[5], uniform_vals=[0.25])
    m, _ = sample_geom_single(cfg, (200, 200), rng, has_labels=True)
    # extra = 100, pos = 25 -> pure translation
    np.testing.assert_allclose(m, [[1, 0, -25], [0, 1, -25]], atol=1e-6)

    # randint 0 -> f = 0.5 -> sc = 200, scale factor 0.5, resize_xlat -0.25
    rng = ScriptedRNG(randint_vals=[0], uniform_vals=[0.0])
    m, _ = sample_geom_single(cfg, (200, 200), rng, has_labels=True)
    np.testing.assert_allclose(m, [[0.5, 0, -0.25], [0, 0.5, -0.25]], atol=1e-6)


def test_warp_reflects_about_image_extent_not_canvas():
    """Sampling beyond the true image extent must reflect image content even
    when the canvas is larger (zeros beyond the extent)."""
    img = np.arange(1, 6, dtype=np.uint8)[None, :, None] * np.ones((4, 1, 3), np.uint8)
    canvas = _canvas_from(img, (8, 8))  # zeros beyond 4x5
    # shift right by 2: output x=0,1 sample x=-2,-1 -> reflect -> 2,1
    m = affine.translation(np.array([[2.0, 0.0]]))
    crop, _ = warp_image_canvas(
        jnp.asarray(canvas[None]),
        jnp.asarray(m.astype(np.float32)),
        jnp.asarray([[4, 5]], np.int32),
        jnp.asarray([1], np.int32),
        (4, 5),
        "reflect101",
    )
    row = np.asarray(crop[0, 0, :, 0])
    np.testing.assert_allclose(row, [3, 2, 1, 2, 3], atol=1e-4)


def test_labels_warp_ignore_outside():
    labels = np.full((6, 6), 3, np.int32)
    canvas = np.zeros((8, 8), np.int32)
    canvas[:6, :6] = labels
    m = affine.translation(np.array([[3.0, 0.0]]))  # shift right 3
    out = warp_labels_canvas(
        jnp.asarray(canvas[None]),
        jnp.asarray(m.astype(np.float32)),
        jnp.asarray([[6, 6]], np.int32),
        (6, 6),
    )
    out = np.asarray(out[0])
    assert (out[:, :3] == 255).all()
    assert (out[:, 3:] == 3).all()


def test_coverage_matches_explicit_mask_warp():
    """Analytic valid-mask coverage == bilinear warp of an all-255 mask with
    constant-0 border (the reference's mask path)."""
    from cutmix_seg_tpu.ops.resample import warp_affine

    rng = np.random.RandomState(1)
    h, w = 40, 50
    m = affine.compose(
        affine.centre(affine.rotation(np.array([0.4])), (h, w)),
        affine.translation(np.array([[5.0, -3.0]])),
    ).astype(np.float32)

    ones = np.ones((1, h, w, 1), np.float32)
    ref = np.asarray(
        warp_affine(ones, m, (h, w), mode="bilinear", border_mode="constant",
                    border_value=0.0)
    )
    canvas = np.full((h, w, 3), 128, np.uint8)
    _, valid = warp_image_canvas(
        jnp.asarray(canvas[None]),
        jnp.asarray(m),
        jnp.asarray([[h, w]], np.int32),
        jnp.asarray([1], np.int32),
        (h, w),
    )
    np.testing.assert_allclose(np.asarray(valid), ref, atol=1e-4)


def test_normalise_alpha_semantics():
    mean = np.array([0.5, 0.5, 0.5])
    std = np.array([0.25, 0.25, 0.25])
    canvas = np.zeros((30, 30, 3), np.uint8)
    canvas[:20, :20] = 100
    out = augment_batch(
        jnp.asarray(canvas[None]),
        None,
        jnp.asarray(affine.identity(1)),
        jnp.asarray([[20, 20]], np.int32),
        jnp.asarray([1], np.int32),
        mean,
        std,
        None,
        out_hw=(30, 30),
        with_labels=False,
    )
    img = np.asarray(out["image"][0])
    # inside: (100/255 - 0.5) / 0.25 ; outside: exactly 0
    np.testing.assert_allclose(img[5, 5], (100 / 255 - 0.5) / 0.25, atol=1e-5)
    np.testing.assert_allclose(img[25, 25], 0.0, atol=1e-6)
    mask = np.asarray(out["mask"][0, ..., 0])
    assert mask[5, 5] == 1.0 and mask[25, 25] == 0.0


def test_pair_params_share_geometry_mask_mt_style():
    """mask_mt applies geometry in single mode (pair split happens after):
    teacher/student share the matrix; only colour differs."""
    cfg = GeomConfig(crop_size=(32, 32), mode="crop", hflip=True)
    rng = np.random.RandomState(3)
    m, interp = sample_geom_single(cfg, (64, 64), rng, has_labels=False)
    assert m.shape == (2, 3)


def test_pair_params_differ_aug_mt_style():
    cfg = GeomConfig(crop_size=(32, 32), mode="crop_scale_hung",
                     crop_offset=(16, 16))
    rng = np.random.RandomState(4)
    (m0, i0), (m1, i1) = sample_geom_pair(cfg, (128, 128), rng, has_labels=False)
    assert not np.allclose(m0, m1)


def test_colour_jitter_properties():
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.uniform(0.1, 0.9, size=(8, 16, 16, 3)).astype(np.float32))
    cfg = ColourJitterConfig(apply_prob=1.0, greyscale_prob=0.0)
    out = colour_jitter(img, jax.random.PRNGKey(0), cfg)
    o = np.asarray(out)
    assert o.shape == img.shape
    assert (o >= 0).all() and (o <= 1).all()
    assert not np.allclose(o, np.asarray(img))

    # forced grayscale: all channels equal
    cfg_g = ColourJitterConfig(apply_prob=0.0, greyscale_prob=1.0)
    grey = np.asarray(colour_jitter(img, jax.random.PRNGKey(1), cfg_g))
    np.testing.assert_allclose(grey[..., 0], grey[..., 1], atol=1e-6)
    np.testing.assert_allclose(grey[..., 1], grey[..., 2], atol=1e-6)

    # apply_prob=0, greyscale_prob=0: identity
    cfg_i = ColourJitterConfig(apply_prob=0.0, greyscale_prob=0.0)
    same = np.asarray(colour_jitter(img, jax.random.PRNGKey(2), cfg_i))
    np.testing.assert_allclose(same, np.asarray(img), atol=1e-6)


def test_colour_jitter_per_sample_op_order():
    """The four-op order is drawn per SAMPLE (torchvision shuffles per call,
    which the reference applies per image) — orders must be valid
    permutations and differ within a batch."""
    from cutmix_seg_tpu.ops.colour import _sample_orders

    orders = np.asarray(_sample_orders(jax.random.PRNGKey(7), 64))
    assert orders.shape == (64, 4)
    for row in orders:
        assert sorted(row.tolist()) == [0, 1, 2, 3]
    assert len({tuple(r) for r in orders.tolist()}) > 1

    # the order must actually influence the output: identical images with
    # identical factor magnitudes but per-sample orders can't all match
    rng = np.random.RandomState(8)
    one = rng.uniform(0.2, 0.8, size=(1, 8, 8, 3)).astype(np.float32)
    img = jnp.asarray(np.repeat(one, 64, axis=0))
    cfg = ColourJitterConfig(brightness=0.8, contrast=0.8, saturation=0.8,
                             hue=0.4, apply_prob=1.0, greyscale_prob=0.0)
    out = np.asarray(colour_jitter(img, jax.random.PRNGKey(9), cfg))
    flat = out.reshape(64, -1)
    assert len({tuple(np.round(r, 5)) for r in flat.tolist()}) > 1


def test_hsv_roundtrip_vs_colorsys():
    import colorsys

    from cutmix_seg_tpu.ops.colour import _hsv_to_rgb, _rgb_to_hsv

    rng = np.random.RandomState(6)
    rgb = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    h, s, v = _rgb_to_hsv(jnp.asarray(rgb[None, None]))
    back = np.asarray(_hsv_to_rgb(h, s, v))[0, 0]
    np.testing.assert_allclose(back, rgb, atol=1e-5)
    for i in range(0, 50, 10):
        hc, sc, vc = colorsys.rgb_to_hsv(*rgb[i])
        assert abs(float(h[0, 0, i]) - hc) < 1e-4
        assert abs(float(s[0, 0, i]) - sc) < 1e-4
        assert abs(float(v[0, 0, i]) - vc) < 1e-4
