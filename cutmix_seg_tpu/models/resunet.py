"""ResUNet (Flax, NHWC): torchvision-style ResNet encoder + additive-skip
U-Net decoder (reference: architectures/resunet.py:36-117).

Encoder taps: pre-ReLU stem BN output (r2), layer1 (r4), layer2 (r8),
layer3 (r16); layer4 output passes through a 1x1 'line0' conv (2048 -> 1024)
before the first decoder block. Decoder blocks do nearest-2x upsample +
additive skip + conv-BN-ReLU; the head is upsample-conv-dropout-BN-ReLU and a
1x1 classifier. BLOCK_SIZE is (32, 32): inputs must be padded to a multiple of
32 so the additive skips align.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cutmix_seg_tpu.models import torch_import
from cutmix_seg_tpu.models.common import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    AddSkipDecoderBlock,
    SegModel,
    batch_norm,
    label_params_by_path,
    upsample_nearest_2x,
)
from cutmix_seg_tpu.models.resnet import ResNetBackbone


class ResUNet(nn.Module):
    num_classes: int
    layers: tuple = (3, 4, 23, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = False):
        use_ra = (not train) or freeze_bn
        _, taps = ResNetBackbone(
            layers=self.layers,
            strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1),
            style="torchvision",
            dtype=self.dtype,
            name="backbone",
        )(x.astype(self.dtype or x.dtype), use_ra)

        y = nn.Conv(1024, (1, 1), dtype=self.dtype, name="line0_conv")(taps["layer4"])
        y = AddSkipDecoderBlock(512, dtype=self.dtype, name="decoder3")(
            y, taps["layer3"], use_ra)
        y = AddSkipDecoderBlock(256, dtype=self.dtype, name="decoder2")(
            y, taps["layer2"], use_ra)
        y = AddSkipDecoderBlock(64, dtype=self.dtype, name="decoder1")(
            y, taps["layer1"], use_ra)
        # r2 skip is the stem BN output BEFORE the ReLU (reference:
        # resunet.py:69 taps `x = bn1(x)` prior to relu)
        y = AddSkipDecoderBlock(64, dtype=self.dtype, name="decoder0")(
            y, taps["stem_prerelu"], use_ra)

        y = upsample_nearest_2x(y)
        y = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="final_dec_conv")(y)
        y = nn.Dropout(0.3, deterministic=not train)(y)
        y = batch_norm(use_ra, "final_dec_bn", self.dtype)(y)
        y = nn.relu(y)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="final_clf")(y)
        return logits


def _param_label_pretrained(params):
    # encoder = pretrained (0.1x LR, BN affine trains), everything else new
    return label_params_by_path(params, [("backbone", "pretrained")], default="new")


def _param_label_scratch(params):
    return label_params_by_path(params, [], default="new")


def _make(num_classes: int, layers, source: str, pretrained: bool, dtype, name):
    module = ResUNet(num_classes=num_classes, layers=layers, dtype=dtype)
    loader = None
    if pretrained:
        def loader(variables):
            return torch_import.load_resnet_backbone(variables, source)
    return SegModel(
        name=name,
        module=module,
        mean=np.asarray(IMAGENET_MEAN),
        std=np.asarray(IMAGENET_STD),
        block_size=(32, 32),
        param_label=_param_label_pretrained if pretrained else _param_label_scratch,
        load_pretrained=loader,
    )


def resnet50unet_imagenet(num_classes: int, dtype=None, pretrained=True) -> SegModel:
    return _make(num_classes, (3, 4, 6, 3), "resnet50_imagenet", pretrained,
                 dtype, "resnet50unet_imagenet")


def resnet101unet_imagenet(num_classes: int, dtype=None, pretrained=True) -> SegModel:
    return _make(num_classes, (3, 4, 23, 3), "resnet101_imagenet", pretrained,
                 dtype, "resnet101unet_imagenet")
