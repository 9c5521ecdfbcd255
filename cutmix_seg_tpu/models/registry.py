"""Architecture registry: name -> SegModel factory.

Mirrors the reference registry surface (reference:
architectures/network_architectures.py:15-112) so CLI ``--arch`` values carry
over unchanged.
"""

from __future__ import annotations

from typing import Callable, Dict

_ARCHS: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _ARCHS[name] = fn
        return fn

    return deco


def get(name: str) -> Callable:
    if name not in _ARCHS:
        raise KeyError(
            f"unknown architecture {name!r}; available: {sorted(_ARCHS)}"
        )
    return _ARCHS[name]


def names():
    return sorted(_ARCHS)


def _register_builtin():
    from cutmix_seg_tpu.models import deeplab2

    register("resnet101_deeplab_imagenet")(deeplab2.resnet101_deeplab_imagenet)
    register("resnet101_deeplab_imagenet_mittal_std")(
        deeplab2.resnet101_deeplab_imagenet_mittal_std
    )
    register("resnet101_deeplab_coco")(deeplab2.resnet101_deeplab_coco)

    from cutmix_seg_tpu.models import resunet

    register("resnet50unet_imagenet")(resunet.resnet50unet_imagenet)
    register("resnet101unet_imagenet")(resunet.resnet101unet_imagenet)

    from cutmix_seg_tpu.models import denseunet

    register("densenet161unet")(denseunet.densenet161unet)
    register("densenet161unet_imagenet")(denseunet.densenet161unet_imagenet)

    from cutmix_seg_tpu.models import deeplab3

    register("resnet101_deeplabv3_imagenet")(deeplab3.resnet101_deeplabv3_imagenet)
    register("resnet101_deeplabv3_coco")(deeplab3.resnet101_deeplabv3_coco)
    register("resnet101_deeplabv3plus_imagenet")(
        deeplab3.resnet101_deeplabv3plus_imagenet
    )

    from cutmix_seg_tpu.models import pspnet

    register("resnet101_pspnet_imagenet")(pspnet.resnet101_pspnet_imagenet)


_register_builtin()
