"""Child process for the 2-process DCN full-train-step test (not a test).

Initialises jax.distributed, builds the shared tiny CutMix mean-teacher
fused step over the GLOBAL 8-device ('data') mesh spanning both processes,
feeds only this process's slice of the deterministic global batch
(parallel.mesh.shard_batch — the trainers' multi-host input path), runs two
chained sharded train steps, and prints the resulting replicated metrics so
the parent can assert (a) both processes computed identical values and
(b) they match the single-process 8-device execution of the same program.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cutmix_seg_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    maybe_initialize_distributed,
    shard_batch,
)

import _dcn_step_common as common  # noqa: E402


def main():
    assert maybe_initialize_distributed(), "coordinator env vars not seen"
    pc, pi = jax.process_count(), jax.process_index()
    assert pc == 2, pc
    n_global = jax.device_count()
    assert n_global == common.GLOBAL_BATCH, (n_global, common.GLOBAL_BATCH)

    mesh = make_mesh(n_global)
    model, state, step = common.build_step_and_state(mesh)

    # each process holds ONLY its rows of the global batch (the multi-host
    # loader contract): process i contributes rows [i*B/2, (i+1)*B/2)
    full = common.global_batch()
    lo, hi = pi * n_global // pc, (pi + 1) * n_global // pc
    local = {k: v[lo:hi] for k, v in full.items()}
    sharded = shard_batch(mesh, {k: jnp.asarray(v) for k, v in local.items()})

    state, metrics = common.run_two_steps(mesh, state, step, sharded)
    assert int(state.step) == 2, int(state.step)
    vals = {k: float(np.asarray(v)) for k, v in sorted(metrics.items())
            if np.asarray(v).ndim == 0}
    assert np.isfinite(vals["sup_loss"]) and np.isfinite(vals["cons_loss"])
    line = " ".join(f"{k}={v:.10e}" for k, v in sorted(vals.items()))
    print(f"DCN_STEP_OK process={pi} step=2 {line}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
