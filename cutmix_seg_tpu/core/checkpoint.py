"""Checkpoint / resume of the full train state.

The reference has no mid-run checkpointing (only a final torch.save;
reference: train_seg_semisup_mask_mt.py:533-535, SURVEY.md §5) — this is a
new subsystem. The whole TrainState pytree {student, teacher-EMA, optimizer
state, step, PRNG key} is serialised with flax's msgpack serialisation
(restartable runs, atomic rename, keep-last-N), plus a separate lightweight
export of eval params for deployment.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import flax.serialization
import jax


def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 2) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    state = jax.device_get(state)
    data = flax.serialization.to_bytes(state)
    path = os.path.join(ckpt_dir, f"ckpt_{step:09d}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    _prune(ckpt_dir, keep)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(
        f for f in os.listdir(ckpt_dir) if re.match(r"ckpt_\d+\.msgpack$", f)
    )
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def restore_checkpoint(path: str, state_template):
    """Restore into a freshly-constructed state of identical structure."""
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(state_template, data)


def export_params(path: str, model_state) -> None:
    """Export eval-net params+stats (the reference's final save_model)."""
    data = flax.serialization.to_bytes(jax.device_get(model_state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _prune(ckpt_dir: str, keep: int):
    ckpts = sorted(
        f for f in os.listdir(ckpt_dir) if re.match(r"ckpt_\d+\.msgpack$", f)
    )
    for f in ckpts[:-keep]:
        os.remove(os.path.join(ckpt_dir, f))
