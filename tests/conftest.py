"""Test configuration: force an 8-virtual-device CPU mesh before JAX
initialises its backend.

Multi-chip sharding is validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8); the real-TPU path is
exercised by bench.py and the driver's compile checks. The environment pins
JAX_PLATFORMS to the TPU plugin, so the platform must be overridden through
jax.config (env alone is not sufficient here).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Numerical-parity tests compare against torch fp32; avoid bf16-precision
# matmuls on the CPU backend (TPU runs choose their own precision).
jax.config.update("jax_default_matmul_precision", "highest")

# The quick bar is dominated by XLA CPU compiles of many small distinct
# programs; the persistent compilation cache (HLO-keyed) makes every run
# after the first reuse them. Tests use their own cache dir (separate from
# the trainers' ~/.cache/cutmix_seg_tpu/xla) and cache even sub-second
# compiles — the suite's cost is the long tail of those.
from cutmix_seg_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compilation_cache,
)

if enable_persistent_compilation_cache(
        os.path.join(os.path.expanduser("~"), ".cache", "cutmix_seg_tpu",
                     "xla-tests")) is not None:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
