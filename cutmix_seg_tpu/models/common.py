"""Shared model plumbing: the segmentation-model protocol, BN handling,
ceil-mode pooling and MXU-friendly align_corners bilinear upsampling.

The reference's informal architecture protocol (forward -> logits at input
resolution, BLOCK_SIZE, MEAN, STD, pretrained/new parameter split,
freeze_batchnorm; reference: architectures/deeplab2.py:131-245) becomes an
explicit ``SegModel`` descriptor here. Models are Flax modules over NHWC
arrays; "freeze BN" means use running statistics and never update them, with
BN affine parameters receiving zero optimizer updates (label 'frozen').
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Standard normalisation statistics.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
IMAGENET_STD = np.array([0.229, 0.224, 0.225])
# Hung et al. Caffe-style stats: BGR ImageNet means flipped to RGB, range 0..255
# (reference: architectures/deeplab2.py:248-266).
HUNG_CAFFE_MEAN = np.array([104.00698793, 116.66876762, 122.67891434])[::-1] / 255.0
HUNG_CAFFE_STD = np.array([1.0, 1.0, 1.0]) / 255.0


@dataclasses.dataclass
class SegModel:
    """A segmentation architecture plus its training metadata.

    module:        Flax module; __call__(x, train, freeze_bn) -> (N,H,W,C) logits
    mean/std:      per-channel input normalisation (net overrides dataset)
    block_size:    (h, w) block multiple required for input padding
    param_label:   params pytree -> {'pretrained','new','frozen'} label pytree
                   (pretrained gets 0.1x LR like the reference two-group optim;
                   frozen gets zero updates)
    load_pretrained: optional fn(variables) -> variables that fills in
                   pretrained backbone weights (host-side numpy conversion)
    """

    name: str
    module: nn.Module
    mean: np.ndarray
    std: np.ndarray
    block_size: Tuple[int, int]
    param_label: Callable[[Any], Any]
    load_pretrained: Optional[Callable[[Any], Any]] = None
    has_batch_stats: bool = True

    def init(self, key, input_hw=(97, 97), batch: int = 1):
        x = jnp.zeros((batch,) + tuple(input_hw) + (3,), jnp.float32)
        return self.module.init(key, x, train=False)

    def apply(self, variables, x, train: bool, freeze_bn: bool = False,
              rngs=None, mutable=None):
        kwargs = dict(train=train, freeze_bn=freeze_bn)
        if mutable is not None:
            return self.module.apply(variables, x, mutable=mutable, rngs=rngs, **kwargs)
        return self.module.apply(variables, x, rngs=rngs, **kwargs)


def label_params_by_path(params, rules: Sequence[Tuple[str, str]], default: str = "new"):
    """Label each param leaf by the first matching path-substring rule.

    :param rules: ordered (substring, label) pairs tested against the
        '/'-joined parameter path.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        for sub, lab in rules:
            if sub in p:
                return lab
        return default

    labels = {
        jax.tree_util.keystr(path): label_of(path) for path, _ in flat
    }

    def mapper(path, leaf):
        return labels[jax.tree_util.keystr(path)]

    return jax.tree_util.tree_map_with_path(mapper, params)


class _FastFrozenBN(nn.Module):
    """Frozen (running-average) BatchNorm as a per-channel affine applied in
    the compute dtype.

    flax's nn.BatchNorm normalises in float32 even under dtype=bfloat16 (it
    promotes x to the f32 parameter dtype, runs sub/mul/add full-tensor in
    f32, and converts the result back), which on a bandwidth-bound TPU step
    doubles the elementwise HBM traffic of every BN in the network. With
    frozen statistics BN is a constant affine, so the channel-sized
    gamma' = scale * rsqrt(var + eps) and beta' = bias - mean * gamma' are
    computed in f32 (negligible) and the full-tensor multiply-add runs in the
    compute dtype. Parameter/variable structure is identical to
    nn.BatchNorm's ({scale, bias} params, {mean, var} batch_stats), so
    checkpoints and the torch weight importer are unaffected.
    """

    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((feat,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((feat,), jnp.float32))
        g = scale * jax.lax.rsqrt(var.value + self.epsilon)
        b = bias - mean.value * g
        # canonicalise to the compute dtype like nn.BatchNorm (an f32 input
        # must not silently promote the affine back to f32)
        x = x.astype(self.dtype)
        return x * g.astype(self.dtype) + b.astype(self.dtype)


def batch_norm(use_running_average: bool, name: str, dtype=None):
    """BatchNorm with torch-compatible defaults (momentum 0.1 torch == 0.9
    flax, eps 1e-5). 'Frozen' BN — the TPU equivalent of the reference's
    freeze_batchnorm() (reference: architectures/util.py:2-10) — is expressed
    by passing use_running_average=True during training; the affine parameters
    are additionally given zero optimizer updates via the 'frozen' param label.
    When BN does train, replicated data-parallel training uses per-replica
    statistics, matching the reference's single-device batch-stat scale when
    the per-replica batch equals the reference batch size (SURVEY.md §7).

    Under a low-precision compute dtype the frozen path folds to a
    compute-dtype channel affine (_FastFrozenBN) instead of flax's
    f32-normalise-and-round — numerically a bf16-rounding-level change, and
    ~1.5x less elementwise HBM traffic. The f32 path keeps flax's exact
    semantics (the torch parity tests compare at f32)."""
    if (use_running_average and dtype is not None
            and jnp.dtype(dtype) != jnp.float32):
        return _FastFrozenBN(epsilon=1e-5, dtype=dtype, name=name)
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


def max_pool_ceil(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """Max pool with torch ceil_mode=True semantics (NHWC).

    Torch pads symmetrically by ``padding`` then, in ceil mode, allows a final
    window that starts inside the padded input; we add the extra right/bottom
    padding needed for the ceil output size. Padding contributes -inf so it
    never wins the max.
    """
    n, h, w, c = x.shape

    def out_size(s):
        return -(-(s + 2 * padding - window) // stride) + 1  # ceil

    oh, ow = out_size(h), out_size(w)
    extra_h = (oh - 1) * stride + window - (h + 2 * padding)
    extra_w = (ow - 1) * stride + window - (w + 2 * padding)
    pads = (
        (0, 0),
        (padding, padding + max(extra_h, 0)),
        (padding, padding + max(extra_w, 0)),
        (0, 0),
    )
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        pads,
    )


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsampling (torch nn.Upsample(scale_factor=2))."""
    n, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def resize_bilinear_half_pixel(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=False (half-pixel) semantics, as used
    by the DeepLab v3/v3+ heads (reference: architectures/deeplab3plus.py:54,77)."""
    import jax

    n, h, w, c = x.shape
    if (h, w) == tuple(out_hw):
        return x
    return jax.image.resize(x, (n,) + tuple(out_hw) + (c,), method="linear",
                            antialias=False)


class AddSkipDecoderBlock(nn.Module):
    """U-Net decoder block shared by ResUNet and DenseUNet
    (reference: architectures/resunet.py:10-33, denseunet.py:10-33):
    nearest-2x upsample, additive skip, 3x3 conv (no bias), BN, ReLU."""

    chn_out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, skip, use_running_average: bool):
        x = upsample_nearest_2x(x)
        x = x + skip
        x = nn.Conv(self.chn_out, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = batch_norm(use_running_average, "conv_bn", self.dtype)(x)
        return nn.relu(x)


def _interp_matrix_align_corners(n_in: int, n_out: int, dtype=np.float32) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, align_corners=True."""
    if n_out == 1 or n_in == 1:
        m = np.zeros((n_out, n_in), dtype=dtype)
        m[:, 0] = 1.0
        return m
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = src - lo
    m = np.zeros((n_out, n_in), dtype=dtype)
    m[np.arange(n_out), lo] += (1.0 - frac).astype(dtype)
    m[np.arange(n_out), hi] += frac.astype(dtype)
    return m


def upsample_bilinear_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch F.interpolate semantics,
    which the reference uses for final logit upsampling;
    reference: architectures/deeplab2.py:195-204).

    Implemented as two small dense contractions (separable interpolation
    matrices built at trace time) so it runs on the MXU instead of gathers.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    wy = jnp.asarray(_interp_matrix_align_corners(h, oh))
    wx = jnp.asarray(_interp_matrix_align_corners(w, ow))
    if x.dtype == jnp.float32:
        # exact torch-parity path (f32 weights, full-precision MXU passes)
        x = jnp.einsum("oh,nhwc->nowc", wy, x,
                       preferred_element_type=jnp.float32, precision="highest")
        x = jnp.einsum("pw,nhwc->nhpc", wx, x,
                       preferred_element_type=jnp.float32, precision="highest")
        return x
    # low-precision compute dtype: accumulate in f32, store in the compute
    # dtype — full-resolution logits are the largest tensors in the step and
    # every pass over them is HBM traffic; the losses upcast internally
    dt = x.dtype
    y = jnp.einsum("oh,nhwc->nowc", wy.astype(dt), x,
                   preferred_element_type=jnp.float32).astype(dt)
    y = jnp.einsum("pw,nhwc->nhpc", wx.astype(dt), y,
                   preferred_element_type=jnp.float32)
    return y.astype(dt)
