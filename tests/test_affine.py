"""Affine algebra tests: exact matrix identities + cross-checks against torch
affine_grid conventions (the reference's own test strategy is dual-path warp
equivalence; see /root/reference/tests/test_data_pipeline.py docstring)."""

import numpy as np

from cutmix_seg_tpu.aug import affine


def test_identity_compose_invert():
    rng = np.random.RandomState(0)
    m = rng.uniform(-1, 1, size=(5, 2, 3)).astype(np.float32)
    m[:, 0, 0] += 2.0  # keep well-conditioned
    m[:, 1, 1] += 2.0
    ident = affine.identity(5)
    np.testing.assert_allclose(affine.compose(m, ident), m, atol=1e-6)
    np.testing.assert_allclose(affine.compose(ident, m), m, atol=1e-6)
    np.testing.assert_allclose(
        affine.compose(m, affine.invert(m)), ident, atol=1e-5
    )
    np.testing.assert_allclose(
        affine.compose(affine.invert(m), m), ident, atol=1e-5
    )


def test_compose_applies_right_to_left():
    # translate by (1, 0) then scale by 2 => point (0,0) -> (2, 0)
    t = affine.translation(np.array([[1.0, 0.0]]))
    s = affine.scale(np.array([[2.0, 2.0]]))
    m = affine.compose(s, t)
    pt = m[0] @ np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(pt, [2.0, 0.0], atol=1e-6)


def test_rotation_convention():
    # 90 degrees CCW with +y down: (1, 0) -> (0, -1) under [[c, s], [-s, c]]
    m = affine.rotation(np.array([np.pi / 2]))
    pt = m[0] @ np.array([1.0, 0.0, 1.0])
    np.testing.assert_allclose(pt, [0.0, -1.0], atol=1e-6)


def test_flip_matrices_map_corners():
    hw = (10, 20)
    # horizontal flip: x -> (w-1) - x
    m = affine.flip_xyd(np.array([[True, False, False]]), hw)
    np.testing.assert_allclose(m[0] @ np.array([0.0, 3.0, 1.0]), [19.0, 3.0], atol=1e-6)
    # vertical flip: y -> (h-1) - y
    m = affine.flip_xyd(np.array([[False, True, False]]), hw)
    np.testing.assert_allclose(m[0] @ np.array([4.0, 0.0, 1.0]), [4.0, 9.0], atol=1e-6)
    # diagonal: swap x and y
    m = affine.flip_xyd(np.array([[False, False, True]]), hw)
    np.testing.assert_allclose(m[0] @ np.array([4.0, 7.0, 1.0]), [7.0, 4.0], atol=1e-6)


def test_cv_to_grid_matches_torch_affine_grid():
    """A pixel-space warp converted by cv_to_grid must agree with torch's
    affine_grid+grid_sample coordinate mapping (align_corners=True)."""
    torch = __import__("torch")
    F = torch.nn.functional

    rng = np.random.RandomState(42)
    h, w = 17, 23
    # a random but well-conditioned pixel-space transform
    theta = rng.uniform(-0.3, 0.3)
    s = rng.uniform(0.8, 1.2)
    m = affine.compose(
        affine.translation(np.array([[3.0, -2.0]])),
        affine.centre(
            affine.compose(
                affine.rotation(np.array([theta])), affine.scale(np.array([[s, s]]))
            ),
            (h, w),
        ),
    )

    grid_m = affine.cv_to_grid(m, (h, w))

    img = rng.uniform(0, 1, size=(1, 1, h, w)).astype(np.float32)
    t_img = torch.tensor(img)
    t_theta = torch.tensor(grid_m, dtype=torch.float32)
    grid = F.affine_grid(t_theta, (1, 1, h, w), align_corners=True)
    torch_out = F.grid_sample(
        t_img, grid, align_corners=True, padding_mode="zeros", mode="bilinear"
    ).numpy()

    # our grid_sample_affine should match torch exactly (same convention)
    from cutmix_seg_tpu.ops.resample import grid_sample_affine

    ours = grid_sample_affine(
        np.transpose(img, (0, 2, 3, 1)), grid_m, (h, w), mode="bilinear"
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, torch_out, atol=2e-5)
