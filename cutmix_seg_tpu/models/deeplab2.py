"""DeepLab v2 (dilated ResNet-101 + summed-ASPP classifier) in Flax, NHWC.

TPU-native re-design of the reference's main architecture
(reference: architectures/deeplab2.py:112-245):

  * dilated ResNet-101 at output stride 8 (layer3 d=2, layer4 d=4);
  * ASPP classifier: parallel 3x3 convs at dilations 6/12/18/24 on the 2048-ch
    features, outputs summed. The reference (faithful to Hung et al.) has a
    return-inside-loop bug so only the first TWO branches are summed
    (deeplab2.py:124-128); we reproduce that by default behind
    ``aspp_branches_used=2`` and expose the fixed variant via
    ``aspp_branches_used=4``;
  * bilinear upsample (align_corners=True) of logits to input resolution,
    done as MXU einsums;
  * BN affine params frozen (zero updates) and, under freeze_bn, running
    stats used during training — matching the reference run configs.

Compute dtype is configurable (bfloat16 recommended on TPU; params stay fp32,
logits are returned fp32 for loss stability).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cutmix_seg_tpu.models import torch_import
from cutmix_seg_tpu.models.common import (
    HUNG_CAFFE_MEAN,
    HUNG_CAFFE_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    SegModel,
    label_params_by_path,
    upsample_bilinear_align_corners,
)
from cutmix_seg_tpu.models.resnet import ResNetBackbone, conv_init, resnet_param_rules


class ASPPSum(nn.Module):
    """Summed atrous spatial pyramid classifier (Hung/Chen DeepLab v2 style)."""

    num_classes: int
    dilations: tuple = (6, 12, 18, 24)
    branches_used: int = 2  # reference quirk; set 4 for the fixed behaviour
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out = None
        for i, d in enumerate(self.dilations):
            y = nn.Conv(
                self.num_classes,
                (3, 3),
                padding=d,
                kernel_dilation=d,
                use_bias=True,
                kernel_init=conv_init,
                dtype=self.dtype,
                name=f"aspp{i}",
            )(x)
            if i < self.branches_used:
                out = y if out is None else out + y
        return out


class DeepLab2(nn.Module):
    num_classes: int
    layers: tuple = (3, 4, 23, 3)
    aspp_branches_used: int = 2
    dtype: Any = None
    dilated_impl: str = "direct"  # 3x3 dilated-conv lowering (resnet.py)

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = True):
        in_hw = x.shape[1:3]
        use_running_average = (not train) or freeze_bn
        feats, _ = ResNetBackbone(
            layers=self.layers,
            strides=(1, 2, 1, 1),
            dilations=(1, 1, 2, 4),
            dtype=self.dtype,
            dilated_impl=self.dilated_impl,
            name="backbone",
        )(x.astype(self.dtype or x.dtype), use_running_average)
        logits = ASPPSum(
            self.num_classes,
            branches_used=self.aspp_branches_used,
            dtype=self.dtype,
            name="classifier",
        )(feats)
        # logits stay in the compute dtype (losses upcast internally); full-res
        # logits are the step's largest tensors and f32 here doubles their HBM
        # traffic. dtype=None keeps the exact f32 path for parity tests.
        return upsample_bilinear_align_corners(logits, in_hw)


def _param_label(params):
    return label_params_by_path(
        params,
        resnet_param_rules(("classifier",), freeze_bn_params=True),
        default="pretrained",
    )


def _make(num_classes: int, mean, std, dtype=None, aspp_branches_used: int = 2,
          pretrained_source: Optional[str] = None, name: str = "deeplab2") -> SegModel:
    module = DeepLab2(num_classes=num_classes, dtype=dtype,
                      aspp_branches_used=aspp_branches_used)
    loader = None
    if pretrained_source is not None:
        def loader(variables):
            return torch_import.load_resnet_deeplab2(variables, pretrained_source)
    return SegModel(
        name=name,
        module=module,
        mean=np.asarray(mean),
        std=np.asarray(std),
        block_size=(1, 1),
        param_label=_param_label,
        load_pretrained=loader,
    )


def resnet101_deeplab_imagenet(num_classes: int, dtype=None, pretrained=True) -> SegModel:
    """ImageNet-pretrained variant (reference: deeplab2.py:284-292)."""
    return _make(num_classes, IMAGENET_MEAN, IMAGENET_STD, dtype,
                 pretrained_source="resnet101_imagenet" if pretrained else None,
                 name="resnet101_deeplab_imagenet")


def resnet101_deeplab_imagenet_mittal_std(num_classes: int, dtype=None, pretrained=True) -> SegModel:
    """ImageNet weights with Hung et al. Caffe-style normalisation stats
    (reference: deeplab2.py:295-307)."""
    return _make(num_classes, HUNG_CAFFE_MEAN, HUNG_CAFFE_STD, dtype,
                 pretrained_source="resnet101_imagenet" if pretrained else None,
                 name="resnet101_deeplab_imagenet_mittal_std")


def resnet101_deeplab_coco(num_classes: int, dtype=None, pretrained=True) -> SegModel:
    """COCO DeepLab checkpoint variant with partial state-dict loading
    (reference: deeplab2.py:248-281; the classifier is only loaded when class
    counts match, mirroring the size-checked partial copy)."""
    return _make(num_classes, HUNG_CAFFE_MEAN, HUNG_CAFFE_STD, dtype,
                 pretrained_source="resnet101_deeplab_coco" if pretrained else None,
                 name="resnet101_deeplab_coco")
