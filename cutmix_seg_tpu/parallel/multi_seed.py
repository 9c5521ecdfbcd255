"""Multi-seed training: K independent replicas of an experiment in ONE XLA
program (the BASELINE.json stretch goal).

The reference's paper tables average 5 split seeds, run as 5 sequential
single-GPU jobs (reference: run_cityscapes_experiments.sh:4-8). On TPU the
idiomatic mapping is to vmap the fused train step over a leading seed axis
and shard that axis across the mesh: each device trains its own seed with no
cross-device collectives at all — perfect scaling for seed sweeps.

Usage:
    states = [create_train_state(model, cfg, key_k, ...) for key_k in keys]
    mstate = stack_states([s for s, _ in states])
    step = make_multi_seed_step(make_mask_mt_step(model, tx, cfg), mesh)
    mstate, metrics = step(mstate, stacked_batch, ramp)   # metrics: (K,) each

Batches are stacked on a leading seed axis too (each seed draws from its own
supervised subset); `metrics` come back per-seed.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def stack_pytrees(trees: Sequence):
    """Stack identical-structure pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def stack_states(states: Sequence):
    return stack_pytrees(states)


def seed_sharding(mesh):
    return NamedSharding(mesh, P("data"))


def make_multi_seed_step(step_fn, mesh):
    """Map a (state, batch, ramp) step over the leading seed axis, sharded
    over the mesh's 'data' axis (state donated).

    Two lowerings, picked at trace time from the stacked leading dim K:

    * K == mesh axis size (seed-per-device — the paper's 5-seed protocol on
      a 5+-device mesh): shard_map, so every device traces the UNBATCHED
      step. This sidesteps two vmap costs: XLA lowers a kernel-batched conv
      as a grouped conv, which (a) requires channel counts divisible by K
      (K=5 fails on 64-channel convs) and (b) lowers poorly (measured 0.89x
      sequential on one chip, round 2).
    * otherwise: jax.vmap over the seed axis with GSPMD sharding (K must
      then divide the networks' channel counts — the grouped-conv
      constraint above).
    """
    n = mesh.shape["data"]
    sh = seed_sharding(mesh)

    def dispatch(state, batch, ramp):
        K = jax.tree_util.tree_leaves(state)[0].shape[0]
        if K == n:
            def body(state_l, batch_l, ramp_l):
                take0 = lambda x: x[0]
                s, m = step_fn(jax.tree_util.tree_map(take0, state_l),
                               jax.tree_util.tree_map(take0, batch_l),
                               ramp_l)
                add0 = lambda x: jnp.asarray(x)[None]
                return (jax.tree_util.tree_map(add0, s),
                        jax.tree_util.tree_map(add0, m))

            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(P("data"), P("data"), P()),
                out_specs=(P("data"), P("data")),
                check_vma=False,
            )(state, batch, ramp)
        return jax.vmap(step_fn, in_axes=(0, 0, None))(state, batch, ramp)

    return jax.jit(
        dispatch,
        in_shardings=(sh, sh, NamedSharding(mesh, P())),
        out_shardings=(sh, sh),
        donate_argnums=(0,),
    )


def unstack_state(mstate, k: int):
    """Extract seed k's state (host-side, e.g. for checkpointing/eval)."""
    return jax.tree_util.tree_map(lambda x: x[k], mstate)
