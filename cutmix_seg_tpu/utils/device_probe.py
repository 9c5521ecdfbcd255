"""Timed device-backend availability probe.

On this environment the TPU is reached through a tunnel, and
``jax.devices()`` blocks indefinitely while the tunnel is down (observed
multi-hour outages). Callers that can fall back (CPU self-hosting) or that
should fail fast (bench) probe backend initialisation in a subprocess with
a timeout instead of touching ``jax.devices()`` directly.

If THIS process already initialised a backend, the probe answers from it
directly: a subprocess could not acquire the (single-client) TPU the parent
holds, and the live backend cannot hang.
"""

from __future__ import annotations

import subprocess
import sys

_PROBE_CODE = "import jax; print(len(jax.devices()))"


def _live_backend_device_count() -> int | None:
    """Device count when this process has ALREADY initialised its backend,
    else None — without triggering initialisation (which could hang)."""
    jax_mod = sys.modules.get("jax")
    if jax_mod is None:
        return None
    try:
        from jax._src import xla_bridge

        if getattr(xla_bridge, "_backends", None):
            return len(jax_mod.devices())
    except Exception:
        return None
    return None


def probe_devices(timeout_s: int = 240,
                  code: str = _PROBE_CODE) -> tuple[int, str]:
    """(device count, diagnostic) for the default backend.

    Count is 0 when initialisation fails or exceeds ``timeout_s``; the
    diagnostic then carries the probe's last stderr line (e.g. libtpu's
    'device already in use' vs a tunnel timeout — different operator
    actions). ``code`` is the probe program run in the subprocess; tests
    inject stand-ins because the real probe's duration is the backend's to
    decide.
    """
    if code == _PROBE_CODE:  # injected programs always run the subprocess
        live = _live_backend_device_count()
        if live is not None:
            return live, "backend already initialised in-process"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        err_tail = (proc.stderr or "").strip().splitlines()[-1:]
        diag = err_tail[0] if err_tail else ""
        if proc.returncode != 0:
            return 0, diag or f"probe exited {proc.returncode}"
        # parse the LAST non-empty stdout line: imports/plugins may print
        # banners before the count
        for line in reversed((proc.stdout or "").strip().splitlines()):
            line = line.strip()
            if line:
                return int(line), diag
        return 0, diag or "probe printed nothing"
    except subprocess.TimeoutExpired:
        return 0, f"backend init exceeded {timeout_s}s (tunnel down?)"
    except (ValueError, OSError) as e:
        return 0, f"unparseable probe output ({e})"


def probe_device_count(timeout_s: int = 240, code: str = _PROBE_CODE) -> int:
    """Number of devices the default backend initialises to, or 0 when
    initialisation fails or exceeds ``timeout_s`` (tunnel down)."""
    return probe_devices(timeout_s, code)[0]
