"""Serving export: a self-contained, ahead-of-time-compiled inference
artifact for deployment.

The reference's only deployment story is ``torch.save(eval_net)`` — a pickle
that needs the full source tree and a torch runtime to load (reference:
train_seg_semisup_mask_mt.py:533-535). The TPU-native equivalent is a
serialized ``jax.export`` artifact: the StableHLO program of
``uint8 image -> prediction`` with the trained weights baked in as constants,
a symbolic batch dimension (one artifact serves any batch size), and
multi-platform lowering (the same bytes run on TPU serving fleets and CPU
fallback hosts). Loading requires only jax — none of this package's code.

The exported program is the whole serving path, fused: uint8 -> float
conversion, the alpha-trick mean/std normalisation, the forward pass, and
(optionally) the argmax — so a serving host ships raw image bytes to the
device and gets back an int32 label map, with no host-side pre/post-processing
to keep in sync with training.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

__all__ = [
    "make_serving_fn",
    "export_serving_artifact",
    "load_serving_artifact",
]

_META_SUFFIX = ".json"


def make_serving_fn(model, model_state, output: str = "argmax"):
    """Build ``serve(x_uint8 NHWC) -> (N,H,W) int32`` (or NHWC float logits).

    Normalisation uses the model's mean/std with a full valid mask — serving
    inputs are whole images, not padded training canvases (reference
    normalisation semantics: seg_transforms_cv.py:598-610).
    """
    if output not in ("argmax", "logits"):
        raise ValueError(f"output must be 'argmax' or 'logits', got {output!r}")
    mean = jnp.asarray(np.asarray(model.mean), jnp.float32)
    std = jnp.asarray(np.asarray(model.std), jnp.float32)
    variables = {"params": model_state.params}
    if model_state.batch_stats:
        variables["batch_stats"] = model_state.batch_stats

    def serve(x):
        x = (x.astype(jnp.float32) / 255.0 - mean) / std
        logits = model.module.apply(variables, x, train=False, freeze_bn=True)
        if output == "argmax":
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return logits

    return serve


def export_serving_artifact(
    model,
    model_state,
    input_hw: Tuple[int, int],
    path: str,
    *,
    output: str = "argmax",
    platforms: Sequence[str] = ("cpu", "tpu"),
    num_classes: Optional[int] = None,
) -> str:
    """AOT-export the serving function to ``path`` (+ ``path.json`` metadata).

    The batch dimension is symbolic: one artifact serves any batch size.
    Spatial dims are static (XLA-optimal layouts at the deployment
    resolution); export one artifact per served resolution.
    """
    serve = make_serving_fn(model, model_state, output=output)
    (b,) = jexport.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b,) + tuple(input_hw) + (3,), jnp.uint8)
    exported = jexport.export(jax.jit(serve), platforms=tuple(platforms))(spec)
    data = exported.serialize()

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)

    meta = {
        "model": model.name,
        "input_hw": list(input_hw),
        "input_dtype": "uint8",
        "output": output,
        "num_classes": num_classes,
        "platforms": list(platforms),
        "mean": np.asarray(model.mean).tolist(),
        "std": np.asarray(model.std).tolist(),
        "format": "jax.export serialized StableHLO",
        "bytes": len(data),
    }
    with open(path + _META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_serving_artifact(path: str):
    """Load an exported artifact: returns (call, meta) where ``call(x_uint8)``
    executes the AOT program on the current default backend. Requires only
    jax — no framework code, no model source."""
    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    meta = None
    if os.path.exists(path + _META_SUFFIX):
        with open(path + _META_SUFFIX) as f:
            meta = json.load(f)
    return exported.call, meta
