"""Patch-distance analysis tests: exact parity with brute-force NumPy."""

import numpy as np

from cutmix_seg_tpu.analysis import patch_dist


def test_boundary_pixels():
    y = np.zeros((8, 8), np.int32)
    y[:, 4:] = 1
    b = patch_dist.boundary_pixels(y)
    # the outermost ring is excluded by the interior crop + pad
    assert b[1:-1, 3].all() and b[1:-1, 4].all()
    assert not b[:, 1].any() and not b[:, 6].any()
    # ignore label suppresses boundaries
    y2 = y.copy()
    y2[:, 4:] = 255
    b2 = patch_dist.boundary_pixels(y2)
    assert not b2.any()


def test_box_sum_matches_uniform_filter():
    rng = np.random.RandomState(0)
    x = rng.uniform(size=(12, 15))
    out = np.asarray(patch_dist.box_sum(x, (3, 5)))
    ref = np.zeros((10, 11))
    for i in range(10):
        for j in range(11):
            ref[i, j] = x[i:i + 3, j:j + 5].sum()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sliding_window_distance_brute_force():
    rng = np.random.RandomState(1)
    img = rng.uniform(size=(14, 16, 3))
    p, q = 5, 5
    patches = np.stack([
        patch_dist.extract_patch(img, (p, q), (6, 7)),
        patch_dist.extract_patch(img, (p, q), (3, 9)),
    ])
    dists = patch_dist.sliding_window_distance_to_patches(img, patches)
    assert dists.shape == (2, 14, 16)

    # brute force on the interior (symmetric padding handles the borders)
    pad = (p - 1) // 2
    padded = np.pad(img, [[pad, pad], [pad, pad], [0, 0]], mode="symmetric")
    for k in range(2):
        for y in range(14):
            for x in range(0, 16, 3):
                win = padded[y:y + p, x:x + q]
                ref = np.sqrt(((win - patches[k]) ** 2).sum())
                assert abs(dists[k, y, x] - ref) < 5e-3, (k, y, x)
    # the distance at each patch's own centre must be ~0
    assert dists[0, 6, 7] < 1e-2
    assert dists[1, 3, 9] < 1e-2


def test_patch_average_distance_map():
    rng = np.random.RandomState(2)
    img = rng.uniform(size=(10, 10, 3))
    avg = np.asarray(patch_dist.patch_average_distance_map(img, (3, 3)))
    assert avg.shape == (10, 10)
    assert (avg >= 0).all()
