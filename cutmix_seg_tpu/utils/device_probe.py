"""Timed device-backend availability probe.

On this environment the TPU is reached through a tunnel, and
``jax.devices()`` blocks indefinitely while the tunnel is down (observed
multi-hour outages). Callers that can fall back (CPU self-hosting) or that
should fail fast (bench) probe backend initialisation in a subprocess with
a timeout instead of touching ``jax.devices()`` directly.
"""

from __future__ import annotations

import subprocess
import sys


_PROBE_CODE = "import jax; print(len(jax.devices()))"


def probe_device_count(timeout_s: int = 240, code: str = _PROBE_CODE) -> int:
    """Number of devices the default backend initialises to, or 0 when
    initialisation fails or exceeds ``timeout_s`` (tunnel down).

    ``code`` is the probe program run in the subprocess; tests inject
    stand-ins because the real probe's duration is the backend's to decide.
    """
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True)
        if proc.returncode != 0:
            return 0
        return int(proc.stdout.strip() or 0)
    except (subprocess.TimeoutExpired, ValueError, OSError):
        return 0
