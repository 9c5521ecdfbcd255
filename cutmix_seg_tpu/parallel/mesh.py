"""Device mesh construction and sharding helpers.

The reference is single-GPU (hardcoded cuda:0;
reference: train_seg_semisup_mask_mt.py:58) — this module is the new,
TPU-native scaling layer (SURVEY.md §2 parallelism audit): data parallelism
over a 1-D 'data' mesh axis via jit + NamedSharding. The train state is
replicated; batches are sharded on their leading axis; XLA inserts psum
all-reduces for the gradients over ICI. Multi-host pods extend the same mesh
over DCN via jax.distributed.initialize (handled in train CLIs).

The largest reference model (DeepLab v2 R101) fits comfortably on one chip, so
tensor/pipeline parallelism is not needed for parity; the mesh carries an
optional (unused-size-1) 'model' axis so model-sharding annotations can be
introduced without re-plumbing.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Multi-host (DCN) initialisation: when the standard coordinator env vars
    are present (JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES,
    JAX_PROCESS_ID]), call jax.distributed.initialize so jax.devices() spans
    the pod and the data mesh extends over DCN. Single-host runs are
    unaffected. Returns True when initialised."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") is None:
        return False
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"], **kwargs
    )
    return True


def make_mesh(n_data: Optional[int] = None, devices=None,
              n_model: int = 1) -> Mesh:
    """('data', 'model') mesh. Default is 1-D data parallelism (trailing
    size-1 'model' axis); pass ``n_model > 1`` for 2-D layouts — e.g. batch
    over 'data' with the image H axis spatially partitioned over 'model'
    (parallel/spatial.py). Devices are laid out with 'model' minor so model
    groups sit on adjacent (ICI-nearest) chips, where the halo-exchange
    traffic flows."""
    devices = devices if devices is not None else jax.devices()
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    if n_data is None:
        if len(devices) % n_model != 0:
            raise ValueError(
                f"n_model={n_model} does not divide the device count "
                f"({len(devices)}); pass n_data explicitly to use a subset")
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices) or n_data < 1:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}")
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the leading axis split over 'data'.

    Single-process: a plain sharded device_put. Multi-host (DCN): each
    process holds only ITS OWN slice of the global batch (the loaders draw
    independent per-host streams), so the global array is assembled from
    process-local data — no host ever materialises or ships the full batch.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    n_proc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def shard_global_batch(mesh: Mesh, batch):
    """Like shard_batch, but every process holds the FULL global batch and
    contributes only its local slice (used by eval, where each host can decode
    the whole validation batch cheaply and correctness requires identical
    global content)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    pc, pi = jax.process_count(), jax.process_index()

    def put(x):
        x = np.asarray(x)
        n = x.shape[0]
        assert n % pc == 0, (n, pc)
        local = x[pi * n // pc:(pi + 1) * n // pc]
        return jax.make_array_from_process_local_data(sh, local, x.shape)

    return jax.tree_util.tree_map(put, batch)


def jit_sharded_step(step_fn, mesh: Mesh):
    """jit a (state, batch, scalar) step with state replicated and batch
    sharded over the data axis. Gradient/metric reductions become ICI
    collectives inserted by XLA."""
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def jit_sharded_eval(eval_fn, mesh: Mesh):
    """jit a (variables..., batch) -> reduced-metric eval function."""
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(repl, data), out_shardings=repl)
