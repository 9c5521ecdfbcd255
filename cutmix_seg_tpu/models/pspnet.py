"""PSPNet (Flax, NHWC): dilated ResNet-101 encoder + Pyramid Pooling head.

Native re-implementation of the capability the reference obtains by wrapping
the MIT CSAIL semantic-segmentation library
(reference: architectures/mit_csail_semseg.py:16-71 — 'resnet101dilated'
encoder, 'ppm' decoder, fc_dim 2048): encoder at output stride 8 (torchvision
dilation pattern), PPM head with (1, 2, 3, 6) adaptive-average-pool bins, each
1x1 conv -> BN -> ReLU -> bilinear upsample; concat with the 2048-ch features;
3x3 conv-BN-ReLU (512), dropout 0.1, 1x1 classifier; logits bilinearly
upsampled to input resolution (align_corners=False, as in the MIT library).
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
    SegModel,
    batch_norm,
    label_params_by_path,
    resize_bilinear_half_pixel,
)
from cutmix_seg_tpu.models.resnet import ResNetBackbone

he_init = nn.initializers.he_normal()


def _adaptive_avg_pool(x, bins: int):
    """torch AdaptiveAvgPool2d semantics: bin b covers
    [floor(b*S/bins), ceil((b+1)*S/bins)). NHWC."""
    n, h, w, c = x.shape
    rows = []
    for by in range(bins):
        y0, y1 = (by * h) // bins, -(-((by + 1) * h) // bins)
        cols = []
        for bx in range(bins):
            x0, x1 = (bx * w) // bins, -(-((bx + 1) * w) // bins)
            cols.append(x[:, y0:y1, x0:x1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (N, bins, bins, C)


class PPMHead(nn.Module):
    num_classes: int
    pool_scales: tuple = (1, 2, 3, 6)
    features: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool, use_running_average: bool):
        branches = [x]
        for i, bins in enumerate(self.pool_scales):
            y = _adaptive_avg_pool(x, bins)
            y = nn.Conv(self.features, (1, 1), use_bias=False,
                        kernel_init=he_init, dtype=self.dtype,
                        name=f"pool{i}_conv")(y)
            y = batch_norm(use_running_average, f"pool{i}_bn", self.dtype)(y)
            y = nn.relu(y)
            y = resize_bilinear_half_pixel(y, x.shape[1:3])
            branches.append(y)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=he_init, dtype=self.dtype, name="conv_last")(y)
        y = batch_norm(use_running_average, "bn_last", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        return nn.Conv(self.num_classes, (1, 1), kernel_init=he_init,
                       dtype=self.dtype, name="classifier")(y)


class PSPNet(nn.Module):
    num_classes: int
    layers: tuple = (3, 4, 23, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = False):
        in_hw = x.shape[1:3]
        use_ra = (not train) or freeze_bn
        feats, _ = ResNetBackbone(
            layers=self.layers, strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
            style="torchvision", dtype=self.dtype, name="backbone",
        )(x.astype(self.dtype or x.dtype), use_ra)
        logits = PPMHead(self.num_classes, dtype=self.dtype,
                         name="decoder")(feats, train, use_ra)
        return resize_bilinear_half_pixel(logits, in_hw)


def _param_label(params):
    return label_params_by_path(params, [("backbone", "pretrained")], default="new")


def resnet101_pspnet_imagenet(num_classes: int, dtype=None, pretrained=True) -> SegModel:
    def loader(variables):
        return torch_import.load_resnet_backbone(variables, "resnet101_imagenet")

    return SegModel(
        name="resnet101_pspnet_imagenet",
        module=PSPNet(num_classes=num_classes, dtype=dtype),
        mean=np.asarray(IMAGENET_MEAN),
        std=np.asarray(IMAGENET_STD),
        block_size=(1, 1),
        param_label=_param_label,
        load_pretrained=loader if pretrained else None,
    )
