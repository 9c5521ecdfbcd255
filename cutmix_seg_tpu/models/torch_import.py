"""Host-side conversion of torch/torchvision pretrained checkpoints into our
Flax variable trees.

The reference downloads torchvision ResNet-101 / Hung et al. COCO DeepLab
checkpoints at runtime (reference: architectures/deeplab2.py:23-24,248-307).
This environment has no egress, so weights are read from a local directory
given by the ``CUTMIX_SEG_WEIGHTS`` environment variable (or
``~/.cache/cutmix_seg_tpu``); file names:

    resnet101_imagenet.pth        torchvision resnet101 state_dict
    resnet50_imagenet.pth         torchvision resnet50 state_dict
    densenet161_imagenet.pth      torchvision densenet161 state_dict
    resnet101_deeplab_coco.pth    Hung et al. COCO DeepLab v2 state_dict

Conversion is a pure name/layout map (torch OIHW conv kernels -> flax HWIO),
with the reference's partial-load semantics: entries are copied only when the
name maps and the shape matches (reference: deeplab2.py:310-322), so e.g. the
COCO checkpoint's 21-class ASPP head is skipped for other class counts.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Tuple

import numpy as np

import flax
import jax.numpy as jnp


def weights_dir() -> str:
    return os.environ.get(
        "CUTMIX_SEG_WEIGHTS",
        os.path.join(os.path.expanduser("~"), ".cache", "cutmix_seg_tpu"),
    )


def load_torch_state_dict(name: str) -> Dict[str, np.ndarray]:
    """Load a torch state_dict file as numpy arrays (host-side)."""
    path = os.path.join(weights_dir(), name + ".pth")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"pretrained weights not found: {path}. Place the torch state_dict "
            f"there or set CUTMIX_SEG_WEIGHTS."
        )
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def _conv_kernel(t: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(t, (2, 3, 1, 0))


def map_torch_resnet(sd: Dict[str, np.ndarray]):
    """Map torchvision-style ResNet keys (also the backbone part of the Hung
    DeepLab checkpoint) to (params_updates, stats_updates) nested dicts rooted
    at the backbone module."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    bn_param = {"weight": "scale", "bias": "bias"}
    bn_stat = {"running_mean": "mean", "running_var": "var"}

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] == "conv1" and parts[1] == "weight":
            put(params, ("conv1", "kernel"), _conv_kernel(val))
        elif parts[0] == "bn1":
            if parts[1] in bn_param:
                put(params, ("bn1", bn_param[parts[1]]), val)
            elif parts[1] in bn_stat:
                put(stats, ("bn1", bn_stat[parts[1]]), val)
        elif re.match(r"layer\d+$", parts[0]):
            block = f"{parts[0]}_{parts[1]}"
            rest = parts[2:]
            if rest[0].startswith("conv") and rest[1] == "weight":
                put(params, (block, rest[0], "kernel"), _conv_kernel(val))
            elif rest[0].startswith("bn"):
                if rest[1] in bn_param:
                    put(params, (block, rest[0], bn_param[rest[1]]), val)
                elif rest[1] in bn_stat:
                    put(stats, (block, rest[0], bn_stat[rest[1]]), val)
            elif rest[0] == "downsample":
                if rest[1] == "0" and rest[2] == "weight":
                    put(params, (block, "downsample_conv", "kernel"), _conv_kernel(val))
                elif rest[1] == "1":
                    if rest[2] in bn_param:
                        put(params, (block, "downsample_bn", bn_param[rest[2]]), val)
                    elif rest[2] in bn_stat:
                        put(stats, (block, "downsample_bn", bn_stat[rest[2]]), val)
        # fc.* (ImageNet classifier) intentionally dropped
    return params, stats


def map_hung_deeplab_classifier(sd: Dict[str, np.ndarray]):
    """Map the Hung COCO checkpoint's layer5 ASPP head to our classifier."""
    params: Dict = {}
    for key, val in sd.items():
        m = re.match(r"layer5\.conv2d_list\.(\d+)\.(weight|bias)", key)
        if not m:
            continue
        idx, kind = int(m.group(1)), m.group(2)
        branch = params.setdefault(f"aspp{idx}", {})
        if kind == "weight":
            branch["kernel"] = _conv_kernel(val)
        else:
            branch["bias"] = val
    return params


def merge_updates(variables, params_updates: Dict, stats_updates: Dict,
                  params_root: Tuple[str, ...] = (), verbose: bool = False):
    """Copy updates into a flax variables dict with shape-checked partial-load
    semantics. Returns (new_variables, n_loaded, n_skipped)."""
    variables = flax.core.unfreeze(variables)
    counters = {"loaded": 0, "skipped": 0}

    def walk(dst, src, prefix):
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst and isinstance(dst[k], dict):
                    walk(dst[k], v, prefix + (k,))
                else:
                    counters["skipped"] += _count_leaves(v)
                    if verbose:
                        print(f"  missing subtree {'/'.join(prefix + (k,))}")
            else:
                if k in dst and tuple(np.shape(dst[k])) == tuple(np.shape(v)):
                    dst[k] = jnp.asarray(v, dtype=jnp.asarray(dst[k]).dtype)
                    counters["loaded"] += 1
                else:
                    counters["skipped"] += 1
                    if verbose:
                        print(f"  shape/name mismatch at {'/'.join(prefix + (k,))}")

    def _count_leaves(t):
        return sum(_count_leaves(v) if isinstance(v, dict) else 1 for v in t.values())

    root_p = variables["params"]
    root_s = variables.get("batch_stats", {})
    for r in params_root:
        root_p = root_p[r]
        root_s = root_s.get(r, {}) if isinstance(root_s, dict) else {}
    walk(root_p, params_updates, params_root)
    if stats_updates and root_s is not None:
        walk(root_s, stats_updates, params_root)
    return variables, counters["loaded"], counters["skipped"]


def load_resnet_deeplab2(variables, source: str, verbose: bool = False):
    """Fill a DeepLab2 variables tree from a torch checkpoint.

    source: 'resnet101_imagenet' (backbone only) or 'resnet101_deeplab_coco'
    (backbone + ASPP head where shapes match).
    """
    sd = load_torch_state_dict(source)
    params_u, stats_u = map_torch_resnet(sd)
    variables, n1, s1 = merge_updates(
        variables, {"backbone": params_u}, {"backbone": stats_u}, verbose=verbose
    )
    n2 = s2 = 0
    if source == "resnet101_deeplab_coco":
        head = map_hung_deeplab_classifier(sd)
        variables, n2, s2 = merge_updates(
            variables, {"classifier": head}, {}, verbose=verbose
        )
    if verbose:
        print(f"loaded {n1 + n2} tensors, skipped {s1 + s2}")
    return variables


def map_torch_densenet(sd: Dict[str, np.ndarray]):
    """Map torchvision densenet 'features.*' keys to our DenseNetFeatures tree."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    bn_param = {"weight": "scale", "bias": "bias"}
    bn_stat = {"running_mean": "mean", "running_var": "var"}

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] != "features":
            continue  # classifier.* dropped
        parts = parts[1:]
        # normalise 'denseblockN.denselayerM.<name>.<field>' and flat names
        *mods, field = parts
        path = tuple(mods)
        if mods[-1].startswith("conv") and field == "weight":
            put(params, path[:-1] + (mods[-1], "kernel"), _conv_kernel(val))
        elif mods[-1].startswith("norm"):
            if field in bn_param:
                put(params, path[:-1] + (mods[-1], bn_param[field]), val)
            elif field in bn_stat:
                put(stats, path[:-1] + (mods[-1], bn_stat[field]), val)
    return params, stats


def load_densenet_features(variables, source: str, features_name: str = "features",
                           verbose: bool = False):
    """Fill a DenseNetFeatures submodule from a torchvision densenet checkpoint."""
    sd = load_torch_state_dict(source)
    params_u, stats_u = map_torch_densenet(sd)
    variables, n, s = merge_updates(
        variables, {features_name: params_u}, {features_name: stats_u}, verbose=verbose
    )
    if verbose:
        print(f"loaded {n} tensors, skipped {s}")
    return variables


def load_resnet_backbone(variables, source: str, backbone_name: str = "backbone",
                         verbose: bool = False):
    """Fill just a ResNet backbone submodule (ResUNet etc.)."""
    sd = load_torch_state_dict(source)
    params_u, stats_u = map_torch_resnet(sd)
    variables, n, s = merge_updates(
        variables, {backbone_name: params_u}, {backbone_name: stats_u}, verbose=verbose
    )
    if verbose:
        print(f"loaded {n} tensors, skipped {s}")
    return variables
