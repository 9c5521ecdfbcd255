"""Pallas TPU kernel: fused box-mask rasterisation + CutMix blend.

The CutMix inner op — rasterise per-sample box masks and blend two image
batches — is pure memory traffic. The jnp path materialises the mask and the
blend as separate HBM tensors; this kernel produces the blended images AND the
mask in one pass over VMEM tiles: per (sample, row-tile) grid cell it builds
the mask block from broadcasted iotas compared against scalar-prefetched box
rectangles (XOR across boxes, reproducing the reference's repeated inversion;
reference mask_gen.py:110-116) and writes ``x0*(1-m) + x1*m``.

TPU layout note: channels-last blocks would pad the 3-channel lane dimension
to 128 (35x VMEM waste), so images enter the kernel viewed as (N, H, W*C) —
a free reshape — and the in-kernel pixel index is ``lane // C``.

Rectangles must be pre-resolved to NumPy-slice semantics (non-negative,
clamped) — ``resolve_rects`` handles that. Falls back to interpret mode
off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P


def resolve_rects(rects: jnp.ndarray, hw) -> jnp.ndarray:
    """float (N,B,4) y0,x0,y1,x1 -> int32 with NumPy-slice index resolution
    (negative wraps, clamp to [0, size])."""
    h, w = hw
    ri = jnp.trunc(rects).astype(jnp.int32)

    def fix(idx, size):
        idx = jnp.where(idx < 0, idx + size, idx)
        return jnp.clip(idx, 0, size)

    return jnp.stack(
        [fix(ri[..., 0], h), fix(ri[..., 1], w), fix(ri[..., 2], h),
         fix(ri[..., 3], w)], axis=-1)


def _blend_kernel(rects_ref, x0_ref, x1_ref, out_ref, mask_ref, *, n_boxes,
                  invert, tile_h, channels):
    n = pl.program_id(0)
    t = pl.program_id(1)
    th, wc = x0_ref.shape[1], x0_ref.shape[2]
    w = mask_ref.shape[2]
    ys = jax.lax.broadcasted_iota(jnp.int32, (th, wc), 0) + t * tile_h
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, wc), 1) // channels
    ys_m = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0) + t * tile_h
    xs_m = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)

    toggles = jnp.zeros((th, wc), jnp.int32)
    toggles_m = jnp.zeros((th, w), jnp.int32)
    for b in range(n_boxes):
        y0 = rects_ref[n, b, 0]
        x0 = rects_ref[n, b, 1]
        y1 = rects_ref[n, b, 2]
        x1 = rects_ref[n, b, 3]
        inside = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
        toggles = toggles ^ inside.astype(jnp.int32)
        inside_m = (ys_m >= y0) & (ys_m < y1) & (xs_m >= x0) & (xs_m < x1)
        toggles_m = toggles_m ^ inside_m.astype(jnp.int32)
    base = 0 if invert else 1
    m = (toggles ^ base).astype(x0_ref.dtype)
    mask_ref[0] = (toggles_m ^ base).astype(x0_ref.dtype)
    out_ref[0] = x0_ref[0] * (1.0 - m) + x1_ref[0] * m


@functools.partial(jax.jit, static_argnames=("invert", "interpret"))
def cutmix_blend(x0: jnp.ndarray, x1: jnp.ndarray, rects: jnp.ndarray,
                 invert: bool = True, interpret: bool | None = None):
    """Fused mask rasterisation + blend.

    :param x0, x1: (N, H, W, C) float batches
    :param rects: (N, n_boxes, 4) float box params (y0, x0, y1, x1)
    :param invert: reference invert semantics (boxes -> 1 on a 0 base)
    :return: (x_mix (N,H,W,C), mask (N,H,W,1)) with mask in x0's dtype
    """
    n, h, w, c = x0.shape
    n_boxes = rects.shape[1]
    ri = resolve_rects(rects, (h, w))

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    tile_h = h
    for cand in (256, 128, 64, 32, 16, 8):
        if h % cand == 0:
            tile_h = cand
            break

    x0v = x0.reshape(n, h, w * c)
    x1v = x1.reshape(n, h, w * c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, h // tile_h),
        in_specs=[
            pl.BlockSpec((1, tile_h, w * c), lambda i, t, *_: (i, t, 0)),
            pl.BlockSpec((1, tile_h, w * c), lambda i, t, *_: (i, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, w * c), lambda i, t, *_: (i, t, 0)),
            pl.BlockSpec((1, tile_h, w), lambda i, t, *_: (i, t, 0)),
        ],
    )
    kernel = functools.partial(_blend_kernel, n_boxes=n_boxes, invert=invert,
                               tile_h=tile_h, channels=c)
    x_mix, mask = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w * c), x0.dtype),
            jax.ShapeDtypeStruct((n, h, w), x0.dtype),
        ],
        interpret=interpret,
    )(ri, x0v, x1v)
    return x_mix.reshape(n, h, w, c), mask[..., None]


def cutmix_blend_sharded(x0, x1, rects, invert=True, mesh=None,
                         interpret=None):
    """``cutmix_blend`` shard_mapped over the mesh's 'data' axis.

    The kernel is embarrassingly batch-parallel (every output row depends
    only on its own sample's inputs and rectangles), so under a data-sharded
    jit the custom call must partition with the batch rather than force XLA
    to gather the operands onto one device. With no mesh (or a 1-wide data
    axis) this is exactly ``cutmix_blend``.
    """
    if mesh is None or mesh.shape.get("data", 1) <= 1:
        return cutmix_blend(x0, x1, rects, invert=invert, interpret=interpret)
    spec = P("data")
    fn = functools.partial(cutmix_blend, invert=invert, interpret=interpret)
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation; the kernel is per-sample so outputs vary exactly like the
    # in/out specs say
    return jax.shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=(spec, spec),
                         check_vma=False)(x0, x1, rects)
