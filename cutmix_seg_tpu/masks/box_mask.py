"""CutMix / Cutout box-mask generation.

Re-derivation of the reference's ``BoxMaskGenerator`` semantics
(reference: mask_gen.py:46-117) with a TPU-native split:

  * parameter sampling (box rectangles) is cheap and order-dependent — we
    provide a NumPy version (`sample_box_rects_np`) whose draw order matches
    the reference exactly for scripted-RNG tests, and a pure-JAX version
    (`sample_box_rects`) used inside the fused train step;
  * rasterisation + mixing is per-pixel work and runs on device:
    `rasterise_masks` builds (N, H, W, 1) masks from rectangles with
    broadcasted-iota comparisons (no Python loops over boxes in the XLA graph
    beyond a static unroll of n_boxes), XOR-combining multiple boxes just like
    the reference's repeated in-place inversion.

Semantics:
  * ``prop_by_area``: draw target mask proportion p ~ U(prop_range); with
    random aspect ratio the box height fraction is exp(u * log p) and the
    width fraction p / h so that h*w == p (reference: mask_gen.py:81-82).
  * boxes are scaled by sqrt(1/n_boxes) per box.
  * ``within_bounds``: position the box inside the image; otherwise place its
    centre anywhere (parts may fall outside).
  * ``invert``: start from a zero mask and flip box interiors to one (the
    CutMix default — reference CLI default boxmask_no_invert=False, i.e.
    invert=True; train_seg_semisup_mask_mt.py:131-134).
  * rectangle coords are rounded then truncated to int on rasterisation,
    matching the reference's ``int(round(...))`` pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernels(sigma: np.ndarray, max_sigma=None, truncate: float = 4.0):
    """Batch of 1-D Gaussian kernels, (N, kernel_size), normalised to sum 1
    (reference helper: mask_gen.py:26-43; unused by the trainers but part of
    the mask-generation toolkit's surface)."""
    sigma = np.asarray(sigma, dtype=np.float64)
    if max_sigma is None:
        max_sigma = sigma.max()
    radius = int(truncate * max_sigma + 0.5)
    x = np.arange(-radius, radius + 1)[None, :]
    phi = np.exp(-0.5 / (sigma[:, None] ** 2) * x ** 2)
    return phi / phi.sum(axis=1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class BoxMaskConfig:
    prop_range: Tuple[float, float]
    n_boxes: int = 1
    random_aspect_ratio: bool = True
    prop_by_area: bool = True
    within_bounds: bool = True
    invert: bool = True

    @staticmethod
    def from_prop(prop, **kw) -> "BoxMaskConfig":
        if isinstance(prop, (int, float)):
            prop = (float(prop), float(prop))
        return BoxMaskConfig(prop_range=tuple(prop), **kw)


def _props_np(cfg: BoxMaskConfig, n_masks: int, rng: np.random.RandomState):
    """Per-box (y_prop, x_prop) fractional sizes, NumPy draw order matching the
    reference for test parity."""
    lo, hi = cfg.prop_range
    if cfg.prop_by_area:
        mask_props = rng.uniform(lo, hi, size=(n_masks, cfg.n_boxes))
        zero = mask_props == 0.0
        fac = np.sqrt(1.0 / cfg.n_boxes)
        if cfg.random_aspect_ratio:
            y = np.exp(rng.uniform(0.0, 1.0, size=(n_masks, cfg.n_boxes)) * np.log(mask_props))
            x = mask_props / y
            y = y * fac
            x = x * fac
        else:
            # reference aliasing quirk: with a fixed aspect ratio y_props and
            # x_props are THE SAME array there, so its two in-place `*= fac`
            # statements each apply fac to the shared buffer — fixed-aspect
            # boxes scale by 1/n_boxes, not sqrt(1/n_boxes)
            # (mask_gen.py:84-93; verified by the live-reference differential)
            y = x = np.sqrt(mask_props) * (fac * fac)
        y[zero] = 0
        x[zero] = 0
    else:
        fac = np.sqrt(1.0 / cfg.n_boxes)
        if cfg.random_aspect_ratio:
            y = rng.uniform(lo, hi, size=(n_masks, cfg.n_boxes)) * fac
            x = rng.uniform(lo, hi, size=(n_masks, cfg.n_boxes)) * fac
        else:
            # same aliasing quirk as above (mask_gen.py:95-101)
            y = x = rng.uniform(lo, hi, size=(n_masks, cfg.n_boxes)) * (fac * fac)
    return y, x


def sample_box_rects_np(
    cfg: BoxMaskConfig,
    n_masks: int,
    mask_hw: Tuple[int, int],
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Sample box rectangles on the host: (N, n_boxes, 4) of (y0, x0, y1, x1)."""
    if rng is None:
        rng = np.random
    y_props, x_props = _props_np(cfg, n_masks, rng)
    sizes = np.round(
        np.stack([y_props, x_props], axis=2) * np.array(mask_hw)[None, None, :]
    )
    if cfg.within_bounds:
        positions = np.round(
            (np.array(mask_hw) - sizes) * rng.uniform(0.0, 1.0, size=sizes.shape)
        )
        rects = np.append(positions, positions + sizes, axis=2)
    else:
        centres = np.round(np.array(mask_hw) * rng.uniform(0.0, 1.0, size=sizes.shape))
        rects = np.append(centres - sizes * 0.5, centres + sizes * 0.5, axis=2)
    return rects.astype(np.float32)


def sample_box_rects(
    cfg: BoxMaskConfig,
    key: jax.Array,
    n_masks: int,
    mask_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Pure-JAX rectangle sampling for the fully-fused on-device path.

    Same distribution as `sample_box_rects_np` (draw order differs — JAX PRNG
    streams are split, not sequential). Returns (N, n_boxes, 4) float32
    (y0, x0, y1, x1).
    """
    lo, hi = cfg.prop_range
    k_prop, k_aspect, k_pos = jax.random.split(key, 3)
    shape = (n_masks, cfg.n_boxes)

    if cfg.prop_by_area:
        props = jax.random.uniform(k_prop, shape, minval=lo, maxval=hi)
        if cfg.random_aspect_ratio:
            u = jax.random.uniform(k_aspect, shape)
            # exp(u * log p) is safe for p > 0; guard p == 0 exactly like the
            # reference's zero-suppression.
            safe = jnp.maximum(props, 1e-20)
            y = jnp.exp(u * jnp.log(safe))
            x = safe / y
        else:
            # fixed aspect scales by 1/n_boxes, not sqrt(1/n_boxes): the
            # second fac factor lands below — reference aliasing quirk
            # (mask_gen.py:84-93), see sample_box_rects_np
            y = x = jnp.sqrt(props) * (1.0 / cfg.n_boxes) ** 0.5
        zero = props == 0.0
        fac = (1.0 / cfg.n_boxes) ** 0.5
        y = jnp.where(zero, 0.0, y * fac)
        x = jnp.where(zero, 0.0, x * fac)
    else:
        fac = (1.0 / cfg.n_boxes) ** 0.5
        if cfg.random_aspect_ratio:
            y = jax.random.uniform(k_prop, shape, minval=lo, maxval=hi) * fac
            x = jax.random.uniform(k_aspect, shape, minval=lo, maxval=hi) * fac
        else:
            # same aliasing quirk (mask_gen.py:95-101)
            y = x = jax.random.uniform(
                k_prop, shape, minval=lo, maxval=hi) * (fac * fac)

    hw = jnp.asarray(mask_hw, dtype=jnp.float32)
    sizes = jnp.round(jnp.stack([y, x], axis=2) * hw[None, None, :])
    u_pos = jax.random.uniform(k_pos, shape + (2,))
    if cfg.within_bounds:
        pos = jnp.round((hw[None, None, :] - sizes) * u_pos)
        rects = jnp.concatenate([pos, pos + sizes], axis=2)
    else:
        centres = jnp.round(hw[None, None, :] * u_pos)
        rects = jnp.concatenate([centres - sizes * 0.5, centres + sizes * 0.5], axis=2)
    return rects.astype(jnp.float32)


def rasterise_masks(
    rects: jnp.ndarray,
    mask_hw: Tuple[int, int],
    invert: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Rasterise rectangles to (N, H, W, 1) masks on device.

    Each box toggles (XORs) its interior, reproducing the reference's repeated
    ``1 - mask`` in-place inversion across overlapping boxes
    (reference: mask_gen.py:110-116). Coordinates follow ``mask[int(y0):int(y1)]``
    NumPy-slice semantics exactly — including the quirk that negative indices
    (possible with within_bounds=False) wrap around to ``size + idx``, so a box
    crossing the top/left image edge draws nothing (empty slice) rather than a
    clipped box. Reproduced consciously: changing it would change the Cutout
    'outside bounds' distribution relative to the reference.
    """
    h, w = mask_hw
    n, n_boxes, _ = rects.shape
    # int() truncation toward zero for possibly-negative outside-bounds coords
    ri = jnp.trunc(rects).astype(jnp.int32)  # (N, B, 4)

    def _slice_index(idx, size):
        # numpy slice resolution: negative -> size + idx, then clamp to [0, size]
        idx = jnp.where(idx < 0, idx + size, idx)
        return jnp.clip(idx, 0, size)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)[None, None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)[None, None]
    y0 = _slice_index(ri[:, :, 0], h)[:, :, None, None]
    x0 = _slice_index(ri[:, :, 1], w)[:, :, None, None]
    y1 = _slice_index(ri[:, :, 2], h)[:, :, None, None]
    x1 = _slice_index(ri[:, :, 3], w)[:, :, None, None]
    inside = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)  # (N, B, H, W)
    toggles = inside.sum(axis=1) % 2  # XOR across boxes
    base = 0 if invert else 1
    mask = jnp.bitwise_xor(toggles, base)
    return mask.astype(dtype)[..., None]


def sample_masks(
    cfg: BoxMaskConfig,
    key: jax.Array,
    n_masks: int,
    mask_hw: Tuple[int, int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Fused on-device sampling + rasterisation: (N, H, W, 1) masks."""
    rects = sample_box_rects(cfg, key, n_masks, mask_hw)
    return rasterise_masks(rects, mask_hw, invert=cfg.invert, dtype=dtype)
