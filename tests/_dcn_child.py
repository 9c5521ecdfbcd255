"""Child process for the 2-process DCN smoke test (not a test module).

Initialises jax.distributed from the standard coordinator env vars through
``maybe_initialize_distributed`` (the multi-host entry the trainers use,
parallel/mesh.py), asserts the backend spans both processes, and runs one
cross-process all-reduce. Prints ``DCN_OK`` on success.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from cutmix_seg_tpu.parallel.mesh import maybe_initialize_distributed  # noqa: E402


def main():
    assert maybe_initialize_distributed(), "coordinator env vars not seen"
    assert jax.process_count() == 2, jax.process_count()
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == 2 * n_local, (n_global, n_local)

    # one all-reduce across the process boundary: global arange sharded over
    # every device, summed to a replicated scalar
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    glob = np.arange(n_global, dtype=np.float32)
    arr = jax.make_array_from_callback((n_global,), sh, lambda idx: glob[idx])
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    assert float(total) == float(glob.sum()), float(total)

    # the framework's multi-host batch assembly: per-process local slices
    # (shard_batch) and full-copy local slicing (shard_global_batch) must
    # both produce the expected global reduction
    from cutmix_seg_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_global_batch,
    )

    fmesh = make_mesh()
    pi = jax.process_index()
    per_host = n_local  # one row per local device
    local = (np.arange(per_host, dtype=np.float32)
             + 100.0 * pi)[:, None] * np.ones((1, 4), np.float32)
    b = shard_batch(fmesh, {"x": local})
    s = jax.jit(lambda t: jnp.sum(t["x"]),
                out_shardings=NamedSharding(fmesh, P()))(b)
    expect = sum(float((np.arange(per_host) + 100.0 * p).sum() * 4)
                 for p in range(2))
    assert float(s) == expect, (float(s), expect)

    full = np.arange(n_global, dtype=np.float32)[:, None] * np.ones(
        (1, 3), np.float32)
    g = shard_global_batch(fmesh, {"x": full})
    s2 = jax.jit(lambda t: jnp.sum(t["x"]),
                 out_shardings=NamedSharding(fmesh, P()))(g)
    assert float(s2) == float(full.sum()), float(s2)

    print(f"DCN_OK process={jax.process_index()} devices={n_global} "
          f"total={float(total)} batch_sum={float(s)} global_sum={float(s2)}",
          flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
