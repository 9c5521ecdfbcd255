"""Persistent XLA compilation cache wiring.

Big-model compiles dominate cold-start wall-clock (a DeepLab v2 train step
takes minutes to compile on a remote-compile TPU host) and the reference
recipes re-launch trainers dozens of times (`run_*.sh` sweeps n_sup x
algorithm x seed). JAX's persistent compilation cache keys serialized
executables by HLO hash, so every launch after the first reuses the compiled
step. This module turns it on with sane defaults while honouring the
standard JAX knobs.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "cutmix_seg_tpu", "xla")

__all__ = ["enable_persistent_compilation_cache"]


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable the JAX persistent compilation cache; returns the dir or None.

    Precedence: CUTMIX_SEG_NO_COMPILATION_CACHE=1 disables entirely;
    JAX_COMPILATION_CACHE_DIR (the standard knob, already honoured by jax
    itself) wins if set; otherwise ``cache_dir`` or
    ``~/.cache/cutmix_seg_tpu/xla``. Failures to create/use the cache are
    non-fatal (jax degrades to warnings), so this never breaks a run.
    """
    if os.environ.get("CUTMIX_SEG_NO_COMPILATION_CACHE") == "1":
        return None
    import jax

    target = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
              or cache_dir or _DEFAULT_DIR)
    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        # cache every compile that takes meaningful time; the default (1s)
        # already excludes trivial programs
        return target
    except Exception:
        return None
