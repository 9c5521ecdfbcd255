"""Patch-distance analysis kernels (paper Figure 1/2 machinery).

TPU-native re-derivation of the reference's patch-distance toolkit
(reference: patch_dist.py:5-168). The hot op — Euclidean distance from N query
patches to every same-size patch of an image — is reformulated from per-patch
host FFT convolutions (the reference logs 0.25 s per distance map;
intra_inter_class_patch_dist.py:188-189) into ONE batched MXU convolution:

    ||P - Q||^2 = box_sum(P^2) + sum(Q^2) - 2 (P * Q)

where the cross term for ALL patches at once is a single
lax.conv_general_dilated with the patches as an HWIO kernel stack.

Boundary detection and integral-image box sums keep the reference's exact
semantics (ignore label 255, symmetric padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def neighbouring_pixels_class_change(y: np.ndarray):
    """Four (H, W) boolean maps: does the left/right/up/down neighbour have a
    different (non-ignore) class (reference: patch_dist.py:5-24)."""
    y_cen = y[1:-1, 1:-1]
    left = (y_cen != y[1:-1, :-2]) & (y[1:-1, :-2] != 255)
    right = (y_cen != y[1:-1, 2:]) & (y[1:-1, 2:] != 255)
    up = (y_cen != y[:-2, 1:-1]) & (y[:-2, 1:-1] != 255)
    down = (y_cen != y[2:, 1:-1]) & (y[2:, 1:-1] != 255)
    valid = y_cen != 255
    pad = lambda a: np.pad(valid & a, [[1, 1], [1, 1]], mode="constant")
    return pad(left), pad(right), pad(up), pad(down)


def boundary_pixels(y: np.ndarray) -> np.ndarray:
    left, right, up, down = neighbouring_pixels_class_change(y)
    return left | right | up | down


def box_sum(x: jnp.ndarray, box_hw) -> jnp.ndarray:
    """Sliding-window box sum via integral image: (H+1-bh, W+1-bw)."""
    s = jnp.cumsum(jnp.cumsum(x, axis=1), axis=0)
    s = jnp.pad(s, [[1, 0], [1, 0]])
    bh, bw = box_hw
    return (s[bh:, bw:] - s[:-bh, bw:] - s[bh:, :-bw] + s[:-bh, :-bw])


def neighbouring_patch_distance_maps(x: jnp.ndarray, patch_hw):
    """Per-pixel Euclidean distances between the patch centred on each pixel
    and the patches centred on its 4 neighbours (reference: patch_dist.py:57-87)."""
    patch = np.asarray(patch_hw)
    pad = (patch - 1) // 2
    x = jnp.pad(
        x, [[pad[0] + 1, pad[0] + 1], [pad[1] + 1, pad[1] + 1], [0, 0]],
        mode="symmetric")
    cen = x[1:-1, 1:-1, :]

    def d(grad):
        return jnp.sqrt(box_sum((grad ** 2).sum(axis=2), patch_hw))

    return (
        d(cen - x[1:-1, :-2, :]),
        d(x[1:-1, 2:, :] - cen),
        d(cen - x[:-2, 1:-1, :]),
        d(x[2:, 1:-1, :] - cen),
    )


def patch_average_distance_map(x: jnp.ndarray, patch_hw) -> jnp.ndarray:
    l, r, u, d = neighbouring_patch_distance_maps(x, patch_hw)
    return (l + r + u + d) * 0.25


@functools.partial(jax.jit, static_argnames=())
def _sliding_distances(image: jnp.ndarray, patches: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) distances from N patches to every same-size window of a
    symmetric-padded image. image: already padded (H', W', C);
    patches: (N, p, q, C)."""
    n, p, q, c = patches.shape
    p_sqr = box_sum((image * image).sum(axis=2), (p, q))  # (H, W)
    q_sqr = (patches * patches).sum(axis=(1, 2, 3))  # (N,)
    # cross-correlation of the image with every patch in ONE conv:
    # NHWC input, HWIO kernel (p, q, C, N), valid padding
    cross = jax.lax.conv_general_dilated(
        image[None],
        jnp.transpose(patches, (1, 2, 3, 0)),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )[0]  # (H, W, N)
    sqr = p_sqr[None] + q_sqr[:, None, None] - 2.0 * jnp.transpose(cross, (2, 0, 1))
    return jnp.sqrt(jnp.maximum(sqr, 0.0))


def sliding_window_distance_to_patches(image: np.ndarray,
                                       patches: np.ndarray) -> np.ndarray:
    """Distances from each query patch to all windows of ``image``: (N, H, W).

    Replaces the reference's per-patch FFT generator
    (patch_dist.py:130-154) with one batched device convolution.
    """
    patch_hw = np.asarray(patches.shape[1:3])
    pad = (patch_hw - 1) // 2
    padded = np.pad(image, [[pad[0], pad[0]], [pad[1], pad[1]], [0, 0]],
                    mode="symmetric")
    out = _sliding_distances(jnp.asarray(padded, jnp.float32),
                             jnp.asarray(patches, jnp.float32))
    return np.asarray(out)


def sliding_window_distance_to_patch(image: np.ndarray,
                                     patch: np.ndarray) -> np.ndarray:
    return sliding_window_distance_to_patches(image, patch[None])[0]


def extract_patch(image: np.ndarray, patch_hw, yx) -> np.ndarray:
    """Patch of ``patch_hw`` centred at (y, x) (reference: patch_dist.py:157-168)."""
    patch_hw = np.asarray(patch_hw)
    pad = (patch_hw - 1) // 2
    row, col = yx
    return image[row - pad[0]: row + pad[0] + 1,
                 col - pad[1]: col + pad[1] + 1, ...]
