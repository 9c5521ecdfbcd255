"""Dilated ResNet backbone (Flax, NHWC) for the DeepLab / ResUNet families.

Structure matches the torchvision/Caffe ResNets the reference builds on
(reference: architectures/deeplab2.py:65-178, resunet.py:111-117,
deeplab3plus.py:81-101) so torchvision-format pretrained checkpoints convert
mechanically. Two variants are supported:

  * style='deeplab2': the Hung et al. Caffe variant — stride on the first 1x1
    conv, every block of a dilated stage uses the stage dilation, ceil-mode
    stem max-pool. Used with strides (1,2,1,1), dilations (1,1,2,4) for output
    stride 8.
  * style='torchvision': ResNet V1.5 — stride on the 3x3 conv, the first block
    of a dilated stage keeps the previous stage's dilation
    (torchvision replace_stride_with_dilation semantics), floor-mode max-pool.

Parameter names mirror the torch state_dict structure (layerN_B/convK, bnK,
downsample_conv/bn) so the weight importer is a name map, not a graph matcher.
Compute can run in bfloat16 (params stay fp32).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn

from cutmix_seg_tpu.models.common import batch_norm, max_pool_ceil

conv_init = nn.initializers.normal(stddev=0.01)


def _space_to_batch(x, d: int):
    """(B, H, W, C) -> (B*d*d, ceil(H/d), ceil(W/d), C): split the spatial
    grid into d x d dilation phases (zero-padding the remainder)."""
    import jax.numpy as jnp

    b, h, w, c = x.shape
    hp = -(-h // d) * d
    wp = -(-w // d) * d
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    x = x.reshape(b, hp // d, d, wp // d, d, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b * d * d, hp // d, wp // d, c)


def _batch_to_space(x, d: int, out_hw):
    """Inverse of _space_to_batch, sliced back to the original extent."""
    bd, hq, wq, c = x.shape
    b = bd // (d * d)
    x = x.reshape(b, d, d, hq, wq, c)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    x = x.reshape(b, hq * d, wq * d, c)
    return x[:, : out_hw[0], : out_hw[1]]


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    conv2_dilation: int = 1  # may differ on the first block of a dilated stage
    has_downsample: bool = False
    stride_on_conv2: bool = False  # torchvision V1.5 vs Caffe V1 placement
    dtype: Any = None
    # dilated 3x3 lowering: 'direct' (kernel_dilation, XLA's native path) or
    # 's2b' (space-to-batch: d*d dilation phases batched through a dense
    # 3x3 conv — same math/params, different TPU tiling; perf experiment
    # knob, see scripts/space_to_batch_probe.py)
    dilated_impl: str = "direct"

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        residual = x
        s1 = 1 if self.stride_on_conv2 else self.stride
        s2 = self.stride if self.stride_on_conv2 else 1
        y = nn.Conv(self.planes, (1, 1), strides=s1, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(use_running_average, "bn1", self.dtype)(y)
        y = nn.relu(y)
        d = self.conv2_dilation
        conv2 = nn.Conv(self.planes, (3, 3), strides=s2,
                        padding=1 if (self.dilated_impl == "s2b" and d > 1
                                      and s2 == 1) else d,
                        kernel_dilation=1 if (self.dilated_impl == "s2b"
                                              and d > 1 and s2 == 1) else d,
                        use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, name="conv2")
        if self.dilated_impl == "s2b" and d > 1 and s2 == 1:
            # phase p's zero pad corresponds exactly to the dilated conv's
            # out-of-extent taps, so the result equals the direct lowering
            hw = y.shape[1:3]
            y = _batch_to_space(conv2(_space_to_batch(y, d)), d, hw)
        else:
            y = conv2(y)
        y = batch_norm(use_running_average, "bn2", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name="conv3")(y)
        y = batch_norm(use_running_average, "bn3", self.dtype)(y)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=conv_init,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = batch_norm(use_running_average, "downsample_bn",
                                  self.dtype)(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Returns (final features, taps after stem and each layer)."""

    layers: Sequence[int] = (3, 4, 23, 3)
    strides: Sequence[int] = (1, 2, 1, 1)
    dilations: Sequence[int] = (1, 1, 2, 4)
    style: str = "deeplab2"  # or 'torchvision'
    dtype: Any = None
    dilated_impl: str = "direct"  # see Bottleneck.dilated_impl

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        tv = self.style == "torchvision"
        taps = {}
        y = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(use_running_average, "bn1", self.dtype)(y)
        taps["stem_prerelu"] = y
        y = nn.relu(y)
        taps["stem"] = y
        if tv:
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        else:
            y = max_pool_ceil(y, window=3, stride=2, padding=1)

        planes = (64, 128, 256, 512)
        prev_dilation = 1
        for li, (n_blocks, p, s, d) in enumerate(
            zip(self.layers, planes, self.strides, self.dilations), start=1
        ):
            for bi in range(n_blocks):
                first = bi == 0
                if tv:
                    conv2_d = prev_dilation if first else d
                else:
                    conv2_d = d
                y = Bottleneck(
                    planes=p,
                    stride=s if first else 1,
                    dilation=d,
                    conv2_dilation=conv2_d,
                    # projection on the first block of every stage (shape or
                    # dilation change; reference: deeplab2.py:163-171)
                    has_downsample=first,
                    stride_on_conv2=tv,
                    dtype=self.dtype,
                    dilated_impl=self.dilated_impl,
                    name=f"layer{li}_{bi}",
                )(y, use_running_average)
            prev_dilation = d
            taps[f"layer{li}"] = y
        return y, taps


def resnet_param_rules(new_prefixes: Tuple[str, ...], freeze_bn_params: bool):
    """Label rules for a model using this backbone.

    Decoder/classifier params are 'new' (full LR); with ``freeze_bn_params``
    the backbone BN affine parameters are 'frozen' — the reference DeepLab
    sets requires_grad=False on them so they receive no updates at all
    (reference: architectures/deeplab2.py:72-84,143-144); everything else is
    'pretrained' (0.1x LR).
    """
    rules = [(p, "new") for p in new_prefixes]
    if freeze_bn_params:
        rules += [("bn", "frozen")]
    return rules
