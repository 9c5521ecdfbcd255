"""Resampler tests: warp_affine vs torch grid_sample through the coordinate
conversion (dual-path equivalence, the reference test suite's key idea), plus
border-mode behaviour."""

import numpy as np
import torch
import torch.nn.functional as F

from cutmix_seg_tpu.aug import affine
from cutmix_seg_tpu.ops.resample import (
    grid_sample_affine,
    resize_bilinear,
    warp_affine,
)


def _rand_img(rng, h, w, c=3):
    return rng.uniform(0, 1, size=(2, h, w, c)).astype(np.float32)


def _torch_warp(img_nhwc, m_cv, out_hw):
    """Reference warp path: pixel matrix -> torch grid_sample (zeros pad)."""
    n, h, w, c = img_nhwc.shape
    grid_m = affine.cv_to_grid(m_cv, out_hw, (h, w))
    t_img = torch.tensor(np.transpose(img_nhwc, (0, 3, 1, 2)))
    grid = F.affine_grid(
        torch.tensor(grid_m, dtype=torch.float32), (n, c) + tuple(out_hw), align_corners=True
    )
    out = F.grid_sample(t_img, grid, align_corners=True, padding_mode="zeros")
    return np.transpose(out.numpy(), (0, 2, 3, 1))


def test_warp_identity():
    rng = np.random.RandomState(0)
    img = _rand_img(rng, 12, 18)
    m = affine.identity(2)
    out = np.asarray(warp_affine(img, m, (12, 18)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_warp_translation_exact():
    rng = np.random.RandomState(1)
    img = _rand_img(rng, 10, 10)
    m = affine.translation(np.array([[2.0, 3.0], [2.0, 3.0]]))
    out = np.asarray(warp_affine(img, m, (10, 10), border_mode="constant", border_value=0.0))
    np.testing.assert_allclose(out[:, 3:, 2:], img[:, :7, :8], atol=1e-6)
    np.testing.assert_allclose(out[:, :3, :], 0.0, atol=1e-6)


def test_warp_matches_torch_grid_sample_interior():
    """warp_affine (constant border) must agree with the torch grid-sample path
    wherever taps stay in-bounds for both (borders differ: zeros-pad blends)."""
    rng = np.random.RandomState(2)
    h, w = 21, 27
    img = _rand_img(rng, h, w)
    m = affine.compose(
        affine.translation(np.array([[1.5, -0.75], [0.25, 2.0]])),
        affine.centre(
            affine.compose(
                affine.rotation(np.array([0.2, -0.35])),
                affine.scale(np.array([[1.1, 0.9], [0.8, 1.25]])),
            ),
            (h, w),
        ),
    )
    ours = np.asarray(warp_affine(img, m, (h, w), border_mode="constant", border_value=0.0))
    ref = _torch_warp(img, m, (h, w))

    # Validity mask: warp an all-ones image; compare where fully interior
    ones = np.ones_like(img)
    valid = np.asarray(
        warp_affine(ones, m, (h, w), border_mode="constant", border_value=0.0)
    )
    interior = valid > 0.9999
    np.testing.assert_allclose(ours[interior], ref[interior], atol=3e-5)


def test_grid_sample_nearest_matches_torch():
    rng = np.random.RandomState(3)
    h, w = 16, 16
    img = _rand_img(rng, h, w, 1)
    m = affine.centre(affine.rotation(np.array([0.3, -0.1])), (h, w))
    grid_m = affine.cv_to_grid(m, (h, w))
    ours = np.asarray(grid_sample_affine(img, grid_m, (h, w), mode="nearest"))
    t_img = torch.tensor(np.transpose(img, (0, 3, 1, 2)))
    grid = F.affine_grid(torch.tensor(grid_m, dtype=torch.float32), (2, 1, h, w), align_corners=True)
    ref = F.grid_sample(t_img, grid, align_corners=True, mode="nearest").numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    # nearest rounding at exact .5 boundaries may differ; require >99% agreement
    agree = np.isclose(ours, ref, atol=1e-6).mean()
    assert agree > 0.99, f"nearest agreement only {agree:.4f}"


def test_reflect101_border():
    img = np.arange(5, dtype=np.float32).reshape(1, 1, 5, 1)
    img = np.broadcast_to(img, (1, 3, 5, 1)).copy()
    # shift right by 2: output x=0 samples src x=-2 -> reflect101 -> x=2
    m = affine.translation(np.array([[2.0, 0.0]]))
    out = np.asarray(warp_affine(img, m, (3, 5), border_mode="reflect101"))
    np.testing.assert_allclose(out[0, 0, :, 0], [2.0, 1.0, 0.0, 1.0, 2.0], atol=1e-6)


def test_resize_bilinear_matches_torch_half_pixel():
    rng = np.random.RandomState(4)
    img = _rand_img(rng, 9, 13)
    out = np.asarray(resize_bilinear(img, (18, 26)))
    t = torch.tensor(np.transpose(img, (0, 3, 1, 2)))
    ref = F.interpolate(t, size=(18, 26), mode="bilinear", align_corners=False)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_separable_warp_matches_gather_paths():
    """The MXU-matmul separable warp (axis-aligned crop/scale/flip families)
    must match the gather warp: images to f32 rounding, labels and coverage
    exactly (aug/device.py::warp_*_separable)."""
    import jax.numpy as jnp

    from cutmix_seg_tpu.aug.device import (
        warp_image_canvas,
        warp_image_canvas_separable,
        warp_labels_canvas,
        warp_labels_canvas_separable,
    )
    from cutmix_seg_tpu.aug.params import GeomConfig, sample_geom_single

    rng = np.random.RandomState(0)
    n, chh, cww, ohw = 6, 70, 80, (33, 31)
    canvas = np.zeros((n, chh, cww, 3), np.uint8)
    labels = np.full((n, chh, cww), 255, np.uint8)
    sizes = np.zeros((n, 2), np.int32)
    for mode in ("crop", "crop_scale_hung"):
        geom = GeomConfig(crop_size=ohw, mode=mode, hflip=True, vflip=True)
        ms = []
        for k in range(n):
            h, w = rng.randint(40, chh + 1), rng.randint(40, cww + 1)
            canvas[k] = 0
            labels[k] = 255
            canvas[k, :h, :w] = rng.randint(0, 256, (h, w, 3))
            labels[k, :h, :w] = rng.randint(0, 21, (h, w))
            sizes[k] = (h, w)
            m, interp = sample_geom_single(geom, (h, w), rng, True)
            assert interp == 1  # these families always sample bilinearly
            ms.append(m)
        m = jnp.asarray(np.stack(ms))
        cv, sz = jnp.asarray(canvas), jnp.asarray(sizes)
        interp_arr = jnp.ones((n,), jnp.int32)
        crop_g, val_g = warp_image_canvas(cv, m, sz, interp_arr, ohw,
                                          "constant")
        crop_s, val_s = warp_image_canvas_separable(cv, m, sz, ohw)
        np.testing.assert_allclose(np.asarray(crop_s), np.asarray(crop_g),
                                   atol=5e-3, err_msg=mode)
        np.testing.assert_array_equal(np.asarray(val_s), np.asarray(val_g))
        lab_g = warp_labels_canvas(jnp.asarray(labels), m, sz, ohw)
        lab_s = warp_labels_canvas_separable(jnp.asarray(labels), m, sz, ohw)
        np.testing.assert_array_equal(np.asarray(lab_s), np.asarray(lab_g))


def test_separable_for_geom_guard():
    """The diagonal (axis-swapping) flip and the rotation family must stay on
    the gather path (their matrices are not diagonal)."""
    from cutmix_seg_tpu.aug.params import GeomConfig
    from cutmix_seg_tpu.train.common import separable_for_geom

    ok = GeomConfig(crop_size=(8, 8), mode="crop_scale_hung", hflip=True)
    assert separable_for_geom(ok)
    assert not separable_for_geom(
        GeomConfig(crop_size=(8, 8), mode="crop", hvflip=True))
    assert not separable_for_geom(
        GeomConfig(crop_size=(8, 8), mode="crop_rotate_scale",
                   rot_mag_deg=30.0, max_scale=1.1))
