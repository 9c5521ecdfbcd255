"""DeepLab v3 and v3+ (Flax, NHWC), torchvision-compatible structure.

Re-derivation of the reference's v3/v3+ wrappers
(reference: architectures/deeplab3plus.py:26-164):

  * backbone: torchvision-style ResNet-101 at output stride 8
    (replace_stride_with_dilation=[False, True, True]);
  * ASPP: 1x1 + three dilated 3x3 branches (12/24/36 at OS8) + image pooling,
    concat -> 1x1 256 + BN + ReLU + dropout 0.5 (torchvision ASPP);
  * v3 head (DeepLabHead): ASPP -> 3x3 256 BN ReLU -> 1x1 classifier;
  * v3+ head: 48-ch low-level projection from layer1, ASPP output bilinearly
    upsampled (align_corners=False) to the low-level size, concat (304) ->
    two 3x3 conv-BN-ReLU blocks -> 1x1 classifier (Yude Wang variant with two
    conv blocks; reference: deeplab3plus.py:37-48);
  * final bilinear upsample (align_corners=False) to input resolution.

Head conv weights use He-normal init (reference: deeplab3plus.py:58-64).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cutmix_seg_tpu.models import torch_import
from cutmix_seg_tpu.models.common import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    SegModel,
    batch_norm,
    label_params_by_path,
    resize_bilinear_half_pixel,
)
from cutmix_seg_tpu.models.resnet import ResNetBackbone

he_init = nn.initializers.he_normal()


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        pad = self.dilation if self.kernel == 3 else 0
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding=pad,
                    kernel_dilation=self.dilation, use_bias=False,
                    kernel_init=he_init, dtype=self.dtype, name="conv")(x)
        x = batch_norm(use_running_average, "bn", self.dtype)(x)
        return nn.relu(x)


class ASPP(nn.Module):
    dilations: Sequence[int] = (12, 24, 36)
    features: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool, use_running_average: bool):
        branches = [ConvBNReLU(self.features, kernel=1, dtype=self.dtype,
                               name="b0")(x, use_running_average)]
        for i, d in enumerate(self.dilations, start=1):
            branches.append(
                ConvBNReLU(self.features, kernel=3, dilation=d, dtype=self.dtype,
                           name=f"b{i}")(x, use_running_average)
            )
        # image pooling branch
        gap = x.mean(axis=(1, 2), keepdims=True)
        gap = ConvBNReLU(self.features, kernel=1, dtype=self.dtype,
                         name="pool")(gap, use_running_average)
        gap = jnp.broadcast_to(gap, x.shape[:3] + (self.features,))
        branches.append(gap)

        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.features, kernel=1, dtype=self.dtype,
                       name="project")(y, use_running_average)
        return nn.Dropout(0.5, deterministic=not train)(y)


class DeepLabV3Plus(nn.Module):
    num_classes: int
    layers: tuple = (3, 4, 23, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = False):
        in_hw = x.shape[1:3]
        use_ra = (not train) or freeze_bn
        _, taps = ResNetBackbone(
            layers=self.layers, strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
            style="torchvision", dtype=self.dtype, name="backbone",
        )(x.astype(self.dtype or x.dtype), use_ra)

        low = ConvBNReLU(48, kernel=1, dtype=self.dtype, name="project")(
            taps["layer1"], use_ra)
        y = ASPP(dtype=self.dtype, name="aspp")(taps["layer4"], train, use_ra)
        y = resize_bilinear_half_pixel(y, low.shape[1:3])
        y = jnp.concatenate([low, y], axis=-1)
        y = ConvBNReLU(256, dtype=self.dtype, name="head0")(y, use_ra)
        y = ConvBNReLU(256, dtype=self.dtype, name="head1")(y, use_ra)
        logits = nn.Conv(self.num_classes, (1, 1), kernel_init=he_init,
                         dtype=self.dtype, name="classifier")(y)
        return resize_bilinear_half_pixel(logits, in_hw)


class DeepLabV3(nn.Module):
    num_classes: int
    layers: tuple = (3, 4, 23, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = False):
        in_hw = x.shape[1:3]
        use_ra = (not train) or freeze_bn
        _, taps = ResNetBackbone(
            layers=self.layers, strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
            style="torchvision", dtype=self.dtype, name="backbone",
        )(x.astype(self.dtype or x.dtype), use_ra)
        y = ASPP(dtype=self.dtype, name="aspp")(taps["layer4"], train, use_ra)
        y = ConvBNReLU(256, dtype=self.dtype, name="head0")(y, use_ra)
        logits = nn.Conv(self.num_classes, (1, 1), kernel_init=he_init,
                         dtype=self.dtype, name="classifier")(y)
        return resize_bilinear_half_pixel(logits, in_hw)


def _label_imagenet(params):
    # imagenet pretraining: backbone pretrained, heads new
    # (reference: deeplab3plus.py:138-158)
    return label_params_by_path(params, [("backbone", "pretrained")], default="new")


def _label_coco(params):
    # coco pretraining: everything except the final classifier pretrained
    return label_params_by_path(params, [("classifier", "new")], default="pretrained")


def resnet101_deeplabv3plus_imagenet(num_classes: int, dtype=None, pretrained=True) -> SegModel:
    def loader(variables):
        return torch_import.load_resnet_backbone(variables, "resnet101_imagenet")

    return SegModel(
        name="resnet101_deeplabv3plus_imagenet",
        module=DeepLabV3Plus(num_classes=num_classes, dtype=dtype),
        mean=np.asarray(IMAGENET_MEAN),
        std=np.asarray(IMAGENET_STD),
        block_size=(1, 1),
        param_label=_label_imagenet,
        load_pretrained=loader if pretrained else None,
    )


def resnet101_deeplabv3_imagenet(num_classes: int, dtype=None, pretrained=True) -> SegModel:
    def loader(variables):
        return torch_import.load_resnet_backbone(variables, "resnet101_imagenet")

    return SegModel(
        name="resnet101_deeplabv3_imagenet",
        module=DeepLabV3(num_classes=num_classes, dtype=dtype),
        mean=np.asarray(IMAGENET_MEAN),
        std=np.asarray(IMAGENET_STD),
        block_size=(1, 1),
        param_label=_label_imagenet,
        load_pretrained=loader if pretrained else None,
    )


def resnet101_deeplabv3_coco(num_classes: int, dtype=None, pretrained=True) -> SegModel:
    def loader(variables):
        return torch_import.load_resnet_backbone(variables, "resnet101_deeplabv3_coco")

    return SegModel(
        name="resnet101_deeplabv3_coco",
        module=DeepLabV3(num_classes=num_classes, dtype=dtype),
        mean=np.asarray(IMAGENET_MEAN),
        std=np.asarray(IMAGENET_STD),
        block_size=(1, 1),
        param_label=_label_coco,
        load_pretrained=loader if pretrained else None,
    )
