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
