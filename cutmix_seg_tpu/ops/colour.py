"""On-device colour augmentation: torchvision-style ColorJitter + RandomGrayscale.

The reference applies torchvision ColorJitter(brightness, contrast,
saturation, hue) with RandomApply(p) followed by RandomGrayscale(p) to the
*student* element of each unsupervised pair, on uint8 PIL images on the host
(reference: train_seg_semisup_mask_mt.py:170-179,
datapipe/seg_transforms_cv.py:541-584). Here the same distribution runs
vectorised on device over float images in [0, 1]:

  * factors: brightness/contrast/saturation ~ U(max(0, 1-f), 1+f),
    hue ~ U(-h, h) — torchvision's parameter draws;
  * op order: torchvision shuffles the four-op order per call, which at
    host-side per-image application means per SAMPLE; here a permutation is
    drawn per sample and applied via a per-slot select (each slot evaluates
    the four candidate ops on the batch and picks per sample — 16 cheap
    elementwise passes, negligible next to the network convs);
  * arithmetic is float with clamp to [0, 1] rather than torchvision's
    per-op uint8 rounding (sub-quantisation-level deviation);
  * grayscale uses the ITU-R 601 luma weights torchvision uses
    (0.299, 0.587, 0.114).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ColourJitterConfig:
    brightness: float = 0.4
    contrast: float = 0.4
    saturation: float = 0.4
    hue: float = 0.1
    apply_prob: float = 0.8
    greyscale_prob: float = 0.2


def _luma(img):
    r, g, b = img[..., 0:1], img[..., 1:2], img[..., 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-12), 0.0)
    dz = jnp.maximum(deltac, 1e-12)
    rc = (maxc - r) / dz
    gc = (maxc - g) / dz
    bc = (maxc - b) / dz
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(deltac > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _sample_orders(key: jax.Array, n: int) -> jnp.ndarray:
    """(n, 4) int32: an independent permutation of the four ops per sample
    (torchvision shuffles per call; the reference applies it per image)."""
    return jax.vmap(lambda k: jax.random.permutation(k, 4))(
        jax.random.split(key, n))


def colour_jitter(
    img: jnp.ndarray, key: jax.Array, cfg: ColourJitterConfig
) -> jnp.ndarray:
    """Apply ColorJitter(+RandomApply) then RandomGrayscale to (N, H, W, 3)
    float images in [0, 1]."""
    n = img.shape[0]
    keys = jax.random.split(key, 7)

    def factor(k, f):
        return jax.random.uniform(
            k, (n, 1, 1, 1), minval=max(0.0, 1.0 - f), maxval=1.0 + f
        )

    fb = factor(keys[0], cfg.brightness)
    fc = factor(keys[1], cfg.contrast)
    fs = factor(keys[2], cfg.saturation)
    fh = jax.random.uniform(keys[3], (n, 1, 1), minval=-cfg.hue, maxval=cfg.hue)

    def op_brightness(x):
        return jnp.clip(x * fb, 0.0, 1.0)

    def op_contrast(x):
        # torchvision: blend with the mean of the grayscale image
        mean = _luma(x).mean(axis=(1, 2, 3), keepdims=True)
        return jnp.clip(mean + (x - mean) * fc, 0.0, 1.0)

    def op_saturation(x):
        grey = _luma(x)
        return jnp.clip(grey + (x - grey) * fs, 0.0, 1.0)

    def op_hue(x):
        h, s, v = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
        h = (h + fh) % 1.0
        return _hsv_to_rgb(h, s, v)

    ops = [op_brightness, op_contrast, op_saturation, op_hue]
    order = _sample_orders(keys[4], n)  # (n, 4) per-sample permutations

    out = img
    for slot in range(4):
        sel = order[:, slot][:, None, None, None]
        cand = ops[0](out)
        for k in (1, 2, 3):
            cand = jnp.where(sel == k, ops[k](out), cand)
        out = cand

    # RandomApply(p): per-sample choice of jittered vs original
    apply = jax.random.uniform(keys[5], (n, 1, 1, 1)) < cfg.apply_prob
    out = jnp.where(apply, out, img)

    # RandomGrayscale(p)
    to_grey = jax.random.uniform(keys[6], (n, 1, 1, 1)) < cfg.greyscale_prob
    grey3 = jnp.broadcast_to(_luma(out), out.shape)
    return jnp.where(to_grey, grey3, out)
