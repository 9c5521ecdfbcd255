"""DenseUNet-161 (Flax, NHWC): DenseNet-161 encoder + additive-skip decoder —
the reference's ISIC-2017 architecture (reference: architectures/denseunet.py:36-155).

Encoder taps (pre-pool / pre-transition, matching the reference's
named_children iteration where the tap is taken *before* the named module
runs; denseunet.py:104-112):
    relu0 output (96 ch, 1/2), denseblock1 (384, 1/4), denseblock2 (768, 1/8),
    denseblock3 (2112, 1/16); final features are relu(norm5) (2208, 1/32).
The denseblock3 tap passes through a 1x1 'line0' conv (2112 -> 2208). Decoder
channel plan: 2208 -> 768 -> 384 -> 96 -> 96, then the
upsample-conv-dropout-BN-ReLU head and a 1x1 classifier.
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
    AddSkipDecoderBlock,
    SegModel,
    batch_norm,
    label_params_by_path,
    upsample_nearest_2x,
)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        y = batch_norm(use_running_average, "norm1", self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(y)
        y = batch_norm(use_running_average, "norm2", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        for i in range(self.num_layers):
            x = DenseLayer(self.growth_rate, dtype=self.dtype,
                           name=f"denselayer{i + 1}")(x, use_running_average)
        return x


class Transition(nn.Module):
    out_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        x = batch_norm(use_running_average, "norm", self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetFeatures(nn.Module):
    """torchvision densenet feature extractor with taps."""

    num_init_features: int = 96
    growth_rate: int = 48
    block_config: Sequence[int] = (6, 12, 36, 24)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        taps = {}
        x = nn.Conv(self.num_init_features, (7, 7), strides=2, padding=3,
                    use_bias=False, dtype=self.dtype, name="conv0")(x)
        x = batch_norm(use_running_average, "norm0", self.dtype)(x)
        x = nn.relu(x)
        taps["relu0"] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = self.num_init_features
        n_blocks = len(self.block_config)
        for i, n_layers in enumerate(self.block_config, start=1):
            x = DenseBlock(n_layers, self.growth_rate, dtype=self.dtype,
                           name=f"denseblock{i}")(x, use_running_average)
            features += n_layers * self.growth_rate
            taps[f"denseblock{i}"] = x
            if i < n_blocks:
                features //= 2
                x = Transition(features, dtype=self.dtype,
                               name=f"transition{i}")(x, use_running_average)
        x = batch_norm(use_running_average, "norm5", self.dtype)(x)
        return x, taps


class DenseUNet(nn.Module):
    num_classes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = False):
        use_ra = (not train) or freeze_bn
        feats, taps = DenseNetFeatures(dtype=self.dtype, name="features")(
            x.astype(self.dtype or x.dtype), use_ra
        )
        y = nn.relu(feats)  # 2208 ch at 1/32

        line0 = nn.Conv(2208, (1, 1), dtype=self.dtype, name="line0_conv")(
            taps["denseblock3"]
        )
        y = AddSkipDecoderBlock(768, dtype=self.dtype, name="decoder3")(
            y, line0, use_ra)
        y = AddSkipDecoderBlock(384, dtype=self.dtype, name="decoder2")(
            y, taps["denseblock2"], use_ra)
        y = AddSkipDecoderBlock(96, dtype=self.dtype, name="decoder1")(
            y, taps["denseblock1"], use_ra)
        y = AddSkipDecoderBlock(96, dtype=self.dtype, name="decoder0")(
            y, taps["relu0"], use_ra)

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
    return label_params_by_path(params, [("features", "pretrained")], default="new")


def _param_label_scratch(params):
    return label_params_by_path(params, [], default="new")


def densenet161unet(num_classes: int, dtype=None) -> SegModel:
    """From-scratch variant; normalisation stats come from the dataset
    (mean/std None -> dataset RGB stats, reference: denseunet.py:146-148 and
    seg_transforms.get_mean_std)."""
    return SegModel(
        name="densenet161unet",
        module=DenseUNet(num_classes=num_classes, dtype=dtype),
        mean=None,
        std=None,
        block_size=(32, 32),
        param_label=_param_label_scratch,
        load_pretrained=None,
    )


def densenet161unet_imagenet(num_classes: int, dtype=None, pretrained=True) -> SegModel:
    def loader(variables):
        return torch_import.load_densenet_features(variables, "densenet161_imagenet")

    return SegModel(
        name="densenet161unet_imagenet",
        module=DenseUNet(num_classes=num_classes, dtype=dtype),
        mean=np.asarray(IMAGENET_MEAN),
        std=np.asarray(IMAGENET_STD),
        block_size=(32, 32),
        param_label=_param_label_pretrained if pretrained else _param_label_scratch,
        load_pretrained=loader if pretrained else None,
    )
