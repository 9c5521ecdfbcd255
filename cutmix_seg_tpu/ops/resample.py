"""Batched affine resampling on device (the TPU replacement for cv2.warpAffine /
torch F.grid_sample in the reference pipeline).

The reference does per-sample geometric augmentation on the host with OpenCV
(reference: datapipe/seg_transforms_cv.py:366-373 warpAffine calls) and aligns
teacher/student predictions with torch grid_sample
(reference: train_seg_semisup_aug_mt.py:302-312). Here both are one vectorised
gather-based warp that jits into the train step: for each output pixel we
compute a source coordinate from a per-sample affine matrix and blend the four
neighbouring taps. XLA lowers the gathers to efficient TPU dynamic-slices and
fuses the arithmetic.

Coordinate conventions supported:
  * ``warp_affine``: OpenCV pixel-space semantics. The (N,2,3) matrix maps
    source pixel coords -> destination pixel coords; we invert it and sample.
    Border modes: 'reflect101' (cv2.BORDER_REFLECT_101) and 'constant'.
  * ``grid_sample``: torch-style [-1, 1] sample-space semantics with
    align_corners=True, padding_mode='zeros'; the matrix transforms output
    grid locations into input grid locations (as produced by
    cutmix_seg_tpu.aug.affine.cv_to_grid).

All functions are NHWC and fully batched; shapes are static so everything is
jit/vmap/shard_map friendly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _invert_nx2x3(m: jnp.ndarray) -> jnp.ndarray:
    a = m[:, :, :2]
    t = m[:, :, 2:]
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    inv_a = jnp.stack(
        [
            jnp.stack([a[:, 1, 1], -a[:, 0, 1]], axis=-1),
            jnp.stack([-a[:, 1, 0], a[:, 0, 0]], axis=-1),
        ],
        axis=-2,
    ) / det[:, None, None]
    inv_t = -jnp.einsum("nij,njk->nik", inv_a, t)
    return jnp.concatenate([inv_a, inv_t], axis=2)


def _dest_grid(out_hw: Tuple[int, int], dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-centre x/y coordinate grids for the output image, shape (H, W)."""
    h, w = out_hw
    ys = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xs = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    return xs, ys


def _reflect101(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """Reflect an integer tap index into [0, size) without repeating the edge
    sample (OpenCV BORDER_REFLECT_101: ...cba|abcd|cba...)."""
    if size == 1:
        return jnp.zeros_like(coord)
    period = 2 * (size - 1)
    coord = jnp.abs(coord)
    coord = coord % period
    return jnp.where(coord >= size, period - coord, coord)


def _gather_nhwc(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather img[n, iy, ix, :] for per-sample index maps.

    img: (N, H, W, C); iy/ix: (N, Ho, Wo) int32 already in-bounds.
    Returns (N, Ho, Wo, C).
    """
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = (iy * w + ix).reshape(n, -1)
    out = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
    return out.reshape(n, iy.shape[1], iy.shape[2], c)


def _sample_bilinear(
    img: jnp.ndarray,
    sx: jnp.ndarray,
    sy: jnp.ndarray,
    border_mode: str,
    border_value,
) -> jnp.ndarray:
    """Bilinear sample of img (N,H,W,C) at float coords sx/sy (N,Ho,Wo)."""
    n, h, w, c = img.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        if border_mode == "reflect101":
            yc = _reflect101(yi, h)
            xc = _reflect101(xi, w)
            return _gather_nhwc(img, yc, xc)
        # constant border: clamp for the gather, then mask out-of-bounds taps
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = _gather_nhwc(img, yc, xc)
        inb = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        bv = jnp.asarray(border_value, dtype=img.dtype)
        return jnp.where(inb, vals, bv)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def _sample_nearest(
    img: jnp.ndarray,
    sx: jnp.ndarray,
    sy: jnp.ndarray,
    border_mode: str,
    border_value,
) -> jnp.ndarray:
    n, h, w, c = img.shape
    # round-half-away handled as floor(x + 0.5): matches OpenCV's fixed-point
    # nearest rounding closely enough for augmentation purposes.
    xi = jnp.floor(sx + 0.5).astype(jnp.int32)
    yi = jnp.floor(sy + 0.5).astype(jnp.int32)
    if border_mode == "reflect101":
        return _gather_nhwc(img, _reflect101(yi, h), _reflect101(xi, w))
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    vals = _gather_nhwc(img, yc, xc)
    inb = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
    bv = jnp.asarray(border_value, dtype=img.dtype)
    return jnp.where(inb, vals, bv)


@functools.partial(
    jax.jit, static_argnames=("out_hw", "mode", "border_mode", "border_value")
)
def warp_affine(
    img: jnp.ndarray,
    m_cv: jnp.ndarray,
    out_hw: Tuple[int, int],
    mode: str = "bilinear",
    border_mode: str = "reflect101",
    border_value=0.0,
) -> jnp.ndarray:
    """Batched OpenCV-convention affine warp.

    :param img: (N, H, W, C) input images
    :param m_cv: (N, 2, 3) forward matrices (source px -> dest px); they are
        inverted internally, matching cv2.warpAffine without WARP_INVERSE_MAP
    :param out_hw: static output (H, W)
    :param mode: 'bilinear' or 'nearest'
    :param border_mode: 'reflect101' or 'constant'
    :param border_value: fill value for 'constant'
    :return: (N, out_h, out_w, C)
    """
    n = img.shape[0]
    ctype = jnp.promote_types(img.dtype, jnp.float32)
    inv = _invert_nx2x3(m_cv.astype(ctype))
    xs, ys = _dest_grid(out_hw, ctype)
    # src = inv @ [x, y, 1]
    sx = inv[:, 0, 0, None, None] * xs + inv[:, 0, 1, None, None] * ys + inv[:, 0, 2, None, None]
    sy = inv[:, 1, 0, None, None] * xs + inv[:, 1, 1, None, None] * ys + inv[:, 1, 2, None, None]
    sx = jnp.broadcast_to(sx, (n,) + out_hw)
    sy = jnp.broadcast_to(sy, (n,) + out_hw)

    imgf = img.astype(ctype)
    if mode == "bilinear":
        out = _sample_bilinear(imgf, sx, sy, border_mode, border_value)
    elif mode == "nearest":
        out = _sample_nearest(imgf, sx, sy, border_mode, border_value)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return out.astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.floating) else out


@functools.partial(jax.jit, static_argnames=("out_hw", "mode"))
def grid_sample_affine(
    img: jnp.ndarray,
    theta: jnp.ndarray,
    out_hw: Tuple[int, int],
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Affine grid sampling with torch semantics (align_corners=True, zeros pad).

    Equivalent to ``F.grid_sample(img, F.affine_grid(theta, size),
    align_corners=True)`` on NHWC data: ``theta`` maps output grid coords in
    [-1,1] to input grid coords in [-1,1].

    :param img: (N, H, W, C)
    :param theta: (N, 2, 3) grid-space matrices
    :param out_hw: static output (H, W)
    """
    n, h, w, _ = img.shape
    oh, ow = out_hw
    ctype = jnp.promote_types(img.dtype, jnp.float32)
    theta = theta.astype(ctype)

    # Output grid coords in [-1, 1], align_corners=True (corners at +-1).
    gx = jnp.linspace(-1.0, 1.0, ow, dtype=ctype)[None, :]
    gy = jnp.linspace(-1.0, 1.0, oh, dtype=ctype)[:, None]
    gx = jnp.broadcast_to(gx, (oh, ow))
    gy = jnp.broadcast_to(gy, (oh, ow))

    ix = theta[:, 0, 0, None, None] * gx + theta[:, 0, 1, None, None] * gy + theta[:, 0, 2, None, None]
    iy = theta[:, 1, 0, None, None] * gx + theta[:, 1, 1, None, None] * gy + theta[:, 1, 2, None, None]

    # [-1, 1] -> input pixel coords, align_corners=True
    sx = (ix + 1.0) * ((w - 1) / 2.0)
    sy = (iy + 1.0) * ((h - 1) / 2.0)

    imgf = img.astype(ctype)
    if mode == "bilinear":
        out = _sample_bilinear(imgf, sx, sy, "constant", 0.0)
    elif mode == "nearest":
        out = _sample_nearest(imgf, sx, sy, "constant", 0.0)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return out


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.resize(INTER_LINEAR)-convention resize (half-pixel centres, edge
    clamp, no antialias) for NHWC batches."""
    n, h, w, c = img.shape
    return jax.image.resize(img, (n,) + tuple(out_hw) + (c,), method="linear", antialias=False)


def resize_nearest(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize for label maps (NHWC or NHW)."""
    squeeze = False
    if img.ndim == 3:
        img = img[..., None]
        squeeze = True
    n, h, w, c = img.shape
    oh, ow = out_hw
    sy = (jnp.arange(oh) + 0.5) * (h / oh)
    sx = (jnp.arange(ow) + 0.5) * (w / ow)
    iy = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    ix = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    out = img[:, iy][:, :, ix]
    return out[..., 0] if squeeze else out
