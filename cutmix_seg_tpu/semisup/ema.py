"""EMA teacher update as a pure pytree op inside the jitted train step.

Matches the reference EMAWeightOptimizer (reference: optim_weight_ema.py:4-25):
teacher <- alpha * teacher + (1 - alpha) * student over *all* float state —
parameters AND batch-norm running statistics (the reference iterates
state_dict floats, which includes BN running mean/var). Here the "model state"
is a pytree of {params, batch_stats}; we EMA every float leaf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(student_state):
    """Teacher starts as an exact copy of the student."""
    return jax.tree_util.tree_map(lambda x: x, student_state)


def ema_update(teacher_state, student_state, alpha: float):
    """One EMA step. Non-float leaves (e.g. int step counters) are copied."""

    def upd(t, s):
        if jnp.issubdtype(jnp.asarray(t).dtype, jnp.floating):
            return t * alpha + s * (1.0 - alpha)
        return s

    return jax.tree_util.tree_map(upd, teacher_state, student_state)
