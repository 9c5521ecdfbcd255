"""Fused on-device augmentation: one batched warp per sample family +
colour jitter + normalisation.

The host ships fixed-size uint8 canvases (decoded images placed at the canvas
origin, zero-filled beyond their true extent) plus per-sample affine matrices
and true (h, w) extents. The device then:

  1. warps the image canvas to the crop with the per-sample matrix —
     sampling coordinates outside the TRUE image extent reflect about the
     image edges (cv2 BORDER_REFLECT_101 semantics of the reference's
     crop-rotate-scale; seg_transforms_cv.py:366) — with per-sample
     bilinear/nearest selection (the reference uses nearest for the image
     when labels ride along);
  2. warps labels with nearest + constant 255 outside the extent;
  3. computes the valid mask analytically as the bilinear coverage of the
     image-extent rectangle (identical to warping the reference's 255-mask
     with a constant-0 border) — no mask canvas crosses the wire;
  4. optionally colour-jitters the student copy;
  5. normalises with the reference's alpha-channel semantics:
     out = (img/255 - mean * valid) / std, so padding stays exactly 0 after
     standardisation (seg_transforms_cv.py:598-610).

Everything is static-shape and jit-compiled once per (canvas, crop) geometry.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cutmix_seg_tpu.ops.colour import ColourJitterConfig, colour_jitter


def _invert_nx2x3(m):
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


def _source_coords(m, out_hw, n, dtype=jnp.float32):
    inv = _invert_nx2x3(m.astype(dtype))
    ys = jax.lax.broadcasted_iota(dtype, out_hw, 0)
    xs = jax.lax.broadcasted_iota(dtype, out_hw, 1)
    sx = inv[:, 0, 0, None, None] * xs + inv[:, 0, 1, None, None] * ys + inv[:, 0, 2, None, None]
    sy = inv[:, 1, 0, None, None] * xs + inv[:, 1, 1, None, None] * ys + inv[:, 1, 2, None, None]
    return jnp.broadcast_to(sx, (n,) + out_hw), jnp.broadcast_to(sy, (n,) + out_hw)


def _reflect101_dyn(coord, size):
    """Reflect integer taps about [0, size) per-sample (size: (N,1,1) array)."""
    period = jnp.maximum(2 * (size - 1), 1)
    c = jnp.abs(coord) % period
    return jnp.where(c >= size, period - c, c)


def _round_half_up(coord, canvas_n):
    """Nearest-tap rounding with a tiny scale-aware bias.

    Source coordinates land EXACTLY on half-integers whenever the transform's
    rational scale factors allow it (e.g. the Hung crop-scale family), and
    there the floor(c + 0.5) tap choice is decided by the last ulp of the
    f32 mul-add — which differs between compiled programs (FMA contraction).
    A bias of a few ulps of the canvas scale makes every program round such
    boundary coordinates half-UP consistently (the gather and separable warp
    paths must agree bit-for-bit on label taps); genuinely non-boundary
    coordinates are unaffected. The bias is 4 ulps at the canvas magnitude
    (canvas_n * 2**-21): enough to dominate 1-2 ulp FMA-contraction
    differences on boundary coords, small enough that non-boundary coords —
    in particular the irrational coords of the rotate-scale family, which
    has no half-integer boundaries — keep their exact nearest tap."""
    return jnp.floor(coord + (0.5 + canvas_n * (2.0 ** -21)))


def _gather_nhwc(img, iy, ix):
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = (iy * w + ix).reshape(n, -1)
    out = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
    return out.reshape(n, iy.shape[1], iy.shape[2], c)


def _coverage(sx, sy, sizes_wh):
    """Bilinear coverage in [0,1] of the rect [0, w-1] x [0, h-1]: exactly the
    value of bilinearly sampling an all-ones image of that extent with a
    constant-0 border."""
    w = sizes_wh[:, 0][:, None, None]
    h = sizes_wh[:, 1][:, None, None]
    cx = jnp.clip(1.0 - jnp.maximum(-sx, sx - (w - 1.0)), 0.0, 1.0)
    cy = jnp.clip(1.0 - jnp.maximum(-sy, sy - (h - 1.0)), 0.0, 1.0)
    return (cx * cy)[..., None]


@functools.partial(jax.jit, static_argnames=("out_hw", "border"))
def warp_image_canvas(
    canvas: jnp.ndarray,
    m: jnp.ndarray,
    sizes_hw: jnp.ndarray,
    interp: jnp.ndarray,
    out_hw: Tuple[int, int],
    border: str = "constant",
):
    """Warp uint8 image canvases to float crops in [0, 255].

    Border semantics follow the reference transform family:
      * 'constant' — taps outside the true extent contribute 0, matching the
        pad-with-zeros path of RandomCrop / RandomCropScaleHung (the alpha
        trick then makes them exactly 0 post-normalisation);
      * 'reflect101' — taps reflect about the TRUE image extent, matching
        RandomCropRotateScale's cv2.BORDER_REFLECT_101
        (seg_transforms_cv.py:366).

    :param canvas: (N, CH, CW, 3) uint8, image at origin, zeros beyond extent
    :param m: (N, 2, 3) original-image px -> crop px
    :param sizes_hw: (N, 2) int true (h, w) extents
    :param interp: (N,) int32; 0 nearest, 1 bilinear (per sample)
    :param out_hw: crop size
    :return: (crop (N, oh, ow, 3) float32 in [0,255], valid (N, oh, ow, 1))
    """
    n = canvas.shape[0]
    ctype = jnp.float32
    sx, sy = _source_coords(m, out_hw, n, ctype)
    h_i = sizes_hw[:, 0].astype(ctype)[:, None, None]
    w_i = sizes_hw[:, 1].astype(ctype)[:, None, None]

    img = canvas.astype(ctype)

    def tap(yi, xi):
        if border == "reflect101":
            # reflect101 about the TRUE image extent, then clamp to canvas
            yr = _reflect101_dyn(yi, h_i.astype(jnp.int32))
            xr = _reflect101_dyn(xi, w_i.astype(jnp.int32))
            yr = jnp.clip(yr, 0, canvas.shape[1] - 1)
            xr = jnp.clip(xr, 0, canvas.shape[2] - 1)
            return _gather_nhwc(img, yr, xr)
        # constant-0 outside the true extent (the canvas is already zero
        # there, but taps past the canvas edge must not replicate edge pixels)
        yc = jnp.clip(yi, 0, canvas.shape[1] - 1)
        xc = jnp.clip(xi, 0, canvas.shape[2] - 1)
        vals = _gather_nhwc(img, yc, xc)
        inb = (
            (yi >= 0) & (yi < h_i.astype(jnp.int32))
            & (xi >= 0) & (xi < w_i.astype(jnp.int32))
        )[..., None]
        return jnp.where(inb, vals, 0.0)

    # bilinear
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    bil = (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy

    # nearest
    xn = _round_half_up(sx, canvas.shape[2]).astype(jnp.int32)
    yn = _round_half_up(sy, canvas.shape[1]).astype(jnp.int32)
    near = tap(yn, xn)

    use_bil = (interp.astype(jnp.int32) == 1)[:, None, None, None]
    crop = jnp.where(use_bil, bil, near)

    sizes_wh = jnp.stack([sizes_hw[:, 1], sizes_hw[:, 0]], axis=1).astype(ctype)
    cov_bil = _coverage(sx, sy, sizes_wh)
    inb = (
        (xn >= 0) & (xn < w_i.astype(jnp.int32))
        & (yn >= 0) & (yn < h_i.astype(jnp.int32))
    )[..., None].astype(ctype)
    valid = jnp.where(use_bil, cov_bil, inb)
    return crop, valid


@functools.partial(jax.jit, static_argnames=("out_hw", "ignore_value"))
def warp_labels_canvas(
    labels_canvas: jnp.ndarray,
    m: jnp.ndarray,
    sizes_hw: jnp.ndarray,
    out_hw: Tuple[int, int],
    ignore_value: int = 255,
):
    """Nearest warp of int label canvases; outside the true extent -> ignore.

    :param labels_canvas: (N, CH, CW) integer (uint8 transfers preferred)
    """
    n = labels_canvas.shape[0]
    sx, sy = _source_coords(m, out_hw, n)
    xn = _round_half_up(sx, labels_canvas.shape[2]).astype(jnp.int32)
    yn = _round_half_up(sy, labels_canvas.shape[1]).astype(jnp.int32)
    h_i = sizes_hw[:, 0].astype(jnp.int32)[:, None, None]
    w_i = sizes_hw[:, 1].astype(jnp.int32)[:, None, None]
    inb = (xn >= 0) & (xn < w_i) & (yn >= 0) & (yn < h_i)
    yc = jnp.clip(yn, 0, labels_canvas.shape[1] - 1)
    xc = jnp.clip(xn, 0, labels_canvas.shape[2] - 1)
    vals = _gather_nhwc(labels_canvas.astype(jnp.int32)[..., None], yc, xc)[..., 0]
    return jnp.where(inb, vals, ignore_value)


def _axis_weights(coord, extent, canvas_n, bilinear: bool):
    """Per-axis interpolation weight matrix for separable (axis-aligned) warps.

    For a diagonal affine (no rotation, no diagonal flip) the source
    coordinate along each output axis depends only on that axis, so the warp
    factorises into two 1-D resamples. Each 1-D resample is expressed as a
    dense (canvas_n, out_n) matrix with at most two non-zeros per output
    column — the bilinear tap weights — and contracted on the MXU: the
    TPU-native formulation of image warping (matmuls are ~free; 2-D gathers
    are the slowest primitive on TPU).

    :param coord: (N, O) float source coordinate per output position
    :param extent: (N,) true extent along this axis (taps beyond it weight 0,
        matching the constant-0 border of the gather path)
    :param canvas_n: static canvas size along this axis
    :return: (weights (N, canvas_n, O) f32, coverage (N, O) f32 in [0, 1])
    """
    w_iota = jax.lax.broadcasted_iota(jnp.float32, (1, canvas_n, 1), 1)
    c = coord[:, None, :]
    ext = extent.astype(jnp.float32)[:, None, None]
    if bilinear:
        wt = jnp.clip(1.0 - jnp.abs(c - w_iota), 0.0, 1.0)
    else:
        wt = (w_iota == _round_half_up(c, canvas_n)).astype(jnp.float32)
    wt = jnp.where(w_iota < ext, wt, 0.0)
    if bilinear:
        # bilinear coverage of [0, extent-1] (== _coverage per axis)
        cov = jnp.clip(
            1.0 - jnp.maximum(-coord, coord - (extent.astype(jnp.float32)[:, None] - 1.0)),
            0.0, 1.0)
    else:
        r = _round_half_up(coord, canvas_n)
        cov = ((r >= 0) & (r < extent.astype(jnp.float32)[:, None])).astype(jnp.float32)
    return wt, cov


def _source_coords_1d(m, out_hw, dtype=jnp.float32):
    """Per-axis source coords for diagonal matrices: sx(x), sy(y)."""
    inv = _invert_nx2x3(m.astype(dtype))
    xs = jnp.arange(out_hw[1], dtype=dtype)[None, :]
    ys = jnp.arange(out_hw[0], dtype=dtype)[None, :]
    sx = inv[:, 0, 0, None] * xs + inv[:, 0, 2, None]
    sy = inv[:, 1, 1, None] * ys + inv[:, 1, 2, None]
    return sx, sy


_EINSUM_EXACT = dict(precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def warp_image_canvas_separable(
    canvas: jnp.ndarray,
    m: jnp.ndarray,
    sizes_hw: jnp.ndarray,
    out_hw: Tuple[int, int],
):
    """Axis-aligned (diagonal-affine) warp as two MXU matmuls.

    Valid for the 'crop' / 'crop_scale_hung' transform families without the
    diagonal (axis-swapping) flip: their matrices are diagonal, so the warp
    separates into a y-resample then an x-resample, each a dense
    weight-matrix contraction. Bilinear only (those families always sample
    bilinearly; aug/params.py returns interp=1). Border semantics are the
    gather path's 'constant': taps beyond the true extent contribute 0 and
    the valid mask is the bilinear coverage of the extent rectangle —
    results match warp_image_canvas to f32 rounding.
    """
    n, chh, cww, _ = canvas.shape
    sx, sy = _source_coords_1d(m, out_hw)
    wy, covy = _axis_weights(sy, sizes_hw[:, 0], chh, bilinear=True)
    wx, covx = _axis_weights(sx, sizes_hw[:, 1], cww, bilinear=True)
    img = canvas.astype(jnp.float32)
    rows = jnp.einsum("nhwc,nhy->nywc", img, wy, **_EINSUM_EXACT)
    crop = jnp.einsum("nywc,nwx->nyxc", rows, wx, **_EINSUM_EXACT)
    valid = (covy[:, :, None] * covx[:, None, :])[..., None]
    return crop, valid


@functools.partial(jax.jit, static_argnames=("out_hw", "ignore_value"))
def warp_labels_canvas_separable(
    labels_canvas: jnp.ndarray,
    m: jnp.ndarray,
    sizes_hw: jnp.ndarray,
    out_hw: Tuple[int, int],
    ignore_value: int = 255,
):
    """Nearest label warp for diagonal matrices via one-hot matmuls.

    The per-axis weight matrices are exact one-hots at the rounded source
    coordinate, so the contraction selects a single integer value per output
    pixel (exact in f32 for uint8 labels); outside the true extent the
    per-axis coverage is 0 and the output is ``ignore_value`` — identical to
    warp_labels_canvas.
    """
    sx, sy = _source_coords_1d(m, out_hw)
    chh, cww = labels_canvas.shape[1], labels_canvas.shape[2]
    wy, iny = _axis_weights(sy, sizes_hw[:, 0], chh, bilinear=False)
    wx, inx = _axis_weights(sx, sizes_hw[:, 1], cww, bilinear=False)
    lab = labels_canvas.astype(jnp.float32)
    rows = jnp.einsum("nhw,nhy->nyw", lab, wy, **_EINSUM_EXACT)
    vals = jnp.einsum("nyw,nwx->nyx", rows, wx, **_EINSUM_EXACT)
    inb = (iny[:, :, None] * inx[:, None, :]) > 0.0
    return jnp.where(inb, jnp.round(vals).astype(jnp.int32), ignore_value)


def normalise(img_255, valid, mean, std):
    """Alpha-aware standardisation: (img/255 - mean * valid) / std."""
    mean = jnp.asarray(mean, jnp.float32)[None, None, None, :]
    std = jnp.asarray(std, jnp.float32)[None, None, None, :]
    return (img_255 / 255.0 - mean * valid) / std


def border_for_mode(geom_mode: str) -> str:
    """Reference border semantics per transform family: pad-with-zeros for
    crop / Hung crop-scale, reflect for crop-rotate-scale."""
    return "reflect101" if geom_mode == "crop_rotate_scale" else "constant"


@functools.partial(
    jax.jit,
    static_argnames=("out_hw", "with_labels", "colour_cfg", "ignore_value",
                     "border", "separable"),
)
def augment_batch(
    canvas: jnp.ndarray,
    labels_canvas: Optional[jnp.ndarray],
    m: jnp.ndarray,
    sizes_hw: jnp.ndarray,
    interp: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    key: Optional[jax.Array],
    out_hw: Tuple[int, int],
    with_labels: bool,
    colour_cfg: Optional[ColourJitterConfig] = None,
    ignore_value: int = 255,
    border: str = "constant",
    separable: bool = False,
):
    """One fused program: warp + (optional) colour jitter + normalise.

    Returns a dict with 'image' (N,oh,ow,3 float32), 'mask' (N,oh,ow,1) and
    optionally 'labels' (N,oh,ow int32). When ``colour_cfg`` is given, also
    returns 'image_stu': the colour-jittered copy (the teacher/student pair of
    the reference's strong-colour path; geometry shared, colour differs).

    Normalisation matches the reference per border family: with 'constant'
    the alpha trick applies (out-of-image pixels exactly 0 post-norm;
    seg_transforms_cv.py:598-610); with 'reflect101' the warped (reflected)
    content is standardised plainly and only the valid mask marks the
    out-of-image region (seg_transforms_cv.py:366-373).
    """
    if separable:
        # axis-aligned transform families: the warp runs as MXU matmuls
        # (interp is ignored — those families always sample bilinearly)
        crop, valid = warp_image_canvas_separable(canvas, m, sizes_hw, out_hw)
    else:
        crop, valid = warp_image_canvas(
            canvas, m, sizes_hw, interp, out_hw, border)
    out = {"mask": valid}
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    alpha = valid if border == "constant" else jnp.float32(1.0)
    img01 = crop / 255.0
    if colour_cfg is not None:
        stu01 = colour_jitter(img01, key, colour_cfg)
        out["image_stu"] = (stu01 - mean * alpha) / std
    out["image"] = (img01 - mean * alpha) / std
    if with_labels:
        if separable:
            out["labels"] = warp_labels_canvas_separable(
                labels_canvas, m, sizes_hw, out_hw, ignore_value)
        else:
            out["labels"] = warp_labels_canvas(
                labels_canvas, m, sizes_hw, out_hw, ignore_value)
    return out
