"""Tracing / profiling harness (a subsystem the reference lacks entirely —
it prints only wall-clock per epoch; SURVEY.md §5).

Provides:
  * ``trace(logdir)`` — context manager around jax.profiler for XLA/TPU
    traces viewable in TensorBoard/Perfetto;
  * ``StepTimer`` — throughput meter for jitted steps that forces a host
    round-trip to synchronise (on some experimental platforms, e.g. the axon
    tunnel, block_until_ready returns before execution completes);
  * ``images_per_sec`` — the BASELINE.json north-star metric helper.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a jax.profiler trace for the enclosed block (no-op when
    logdir is None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(value) -> float:
    """Force device->host synchronisation by fetching a scalar."""
    arr = np.asarray(value)
    return float(arr.reshape(-1)[0])


class StepTimer:
    """Times a stream of async step dispatches with explicit sync points.

    Usage:
        timer = StepTimer()
        for i in range(n):
            state, metrics = step(state, batch, ramp)
            timer.tick(metrics["sup_loss"], every=20)
        print(timer.summary(images_per_step))
    """

    def __init__(self):
        self.t0 = time.perf_counter()
        self.n_steps = 0
        self.synced_at = 0.0

    def tick(self, sync_value=None, every: int = 0):
        self.n_steps += 1
        if sync_value is not None and every and self.n_steps % every == 0:
            _sync(sync_value)
            self.synced_at = time.perf_counter()

    def finish(self, sync_value) -> float:
        """Final sync; returns elapsed seconds."""
        _sync(sync_value)
        return time.perf_counter() - self.t0

    def steps_per_sec(self, elapsed: float) -> float:
        return self.n_steps / max(elapsed, 1e-9)


def images_per_sec(n_steps: int, batch_per_chip: int, elapsed: float) -> float:
    """Train images/sec/chip — the benchmark's headline number."""
    return n_steps * batch_per_chip / max(elapsed, 1e-9)
