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
import threading
from typing import Optional

import flax.serialization
import jax


def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 2) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    state = jax.device_get(state)
    return _write(ckpt_dir, state, step, keep)


def _write(ckpt_dir: str, host_state, step: int, keep: int) -> str:
    data = flax.serialization.to_bytes(host_state)
    path = os.path.join(ckpt_dir, f"ckpt_{step:09d}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    _prune(ckpt_dir, keep)
    return path


# one writer slot per checkpoint directory: independent trainers in the same
# process (multi-seed sweeps, tests) never join or error-contaminate each
# other. Guarded by _writers_lock; each slot holds (thread, error-box).
_writers: dict = {}
_writers_lock = threading.Lock()


def save_checkpoint_async(ckpt_dir: str, state, step: int,
                          keep: int = 2) -> None:
    """Overlap the serialise+write of a checkpoint with training.

    The D2H fetch (jax.device_get) runs on the caller's thread — it must
    complete before the next train step donates the state's device buffers —
    but msgpack serialisation and the file write (seconds for an R101-scale
    ~700 MB TrainState) proceed on a background thread while the next epoch
    trains. At most one save per directory is in flight: a new call joins
    the previous one first (bounding host memory to one extra state copy),
    and any writer error surfaces on the next call or on
    wait_pending_saves(). Call wait_pending_saves(ckpt_dir) before reading
    the checkpoint back or exiting.
    """
    key = os.path.abspath(ckpt_dir)
    wait_pending_saves(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    host_state = jax.device_get(state)
    box: list = []

    def work():
        try:
            _write(ckpt_dir, host_state, step, keep)
        except BaseException as e:  # surfaced by wait_pending_saves
            box.append(e)

    t = threading.Thread(target=work, name="ckpt-writer", daemon=True)
    with _writers_lock:
        _writers[key] = (t, box)
    t.start()


def wait_pending_saves(ckpt_dir: Optional[str] = None) -> None:
    """Join in-flight async checkpoint writes, re-raising the first error.

    With ``ckpt_dir`` joins that directory's writer only; without, joins all
    (engine shutdown path).
    """
    with _writers_lock:
        if ckpt_dir is None:
            items = list(_writers.items())
        else:
            key = os.path.abspath(ckpt_dir)
            items = [(key, _writers[key])] if key in _writers else []
    first_error = None
    for key, (t, box) in items:
        t.join()
        with _writers_lock:
            # pop only OUR slot: another thread may have re-registered a
            # fresh writer for this directory while we were joining — an
            # unconditional pop would orphan it (lost save, lost error)
            if _writers.get(key) == (t, box):
                del _writers[key]
        if box and first_error is None:
            first_error = box[0]
    if first_error is not None:
        raise first_error


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
