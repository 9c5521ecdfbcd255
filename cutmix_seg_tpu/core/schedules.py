"""Learning-rate schedules as optax schedule functions.

Provides the reference's menu (reference: lr_schedules.py:39-64):
'none', 'stepped' (per-epoch multi-step decay), 'cosine' (per-iter), 'poly'
(per-iter, ``(1 - t)^power``). All are expressed as functions of the global
step so they live inside the jitted update (no host-side scheduler object).
"""

from __future__ import annotations

import ast
from typing import Sequence, Union

import jax.numpy as jnp
import optax


def polynomial_schedule(base_lr: float, total_iters: int, power: float = 0.9,
                        eta_min: float = 0.0):
    """(1 - step/total)^power decay, clamped; step 0 yields base_lr
    (reference: lr_schedules.py:24-35)."""

    def sched(step):
        progress = jnp.clip(step / jnp.maximum(total_iters, 1), 0.0, 1.0)
        fac = jnp.maximum((1.0 - progress) ** power, eta_min)
        return base_lr * fac

    return sched


def stepped_schedule(base_lr: float, milestones: Sequence[int], gamma: float,
                     iters_per_epoch: int):
    """MultiStepLR semantics: lr is multiplied by gamma at each milestone
    *epoch*; expressed as a function of the global iteration."""
    milestones = sorted(int(m) for m in milestones)

    def sched(step):
        epoch = jnp.asarray(step) // max(iters_per_epoch, 1)
        n_passed = jnp.zeros((), dtype=jnp.int32)
        for m in milestones:
            n_passed = n_passed + (epoch >= m).astype(jnp.int32)
        return base_lr * (gamma ** n_passed)

    return sched


def make_lr_schedule(
    schedule_type: str,
    base_lr: float,
    total_iters: int,
    step_epochs: Union[str, Sequence[int], None] = None,
    step_gamma: float = 0.1,
    poly_power: float = 0.9,
    iters_per_epoch: int = 1,
):
    """Factory mirroring the reference CLI surface. Returns an optax schedule."""
    if schedule_type == "none":
        return optax.constant_schedule(base_lr)
    if schedule_type == "stepped":
        if isinstance(step_epochs, str):
            if step_epochs.strip() == "":
                return optax.constant_schedule(base_lr)
            step_epochs = ast.literal_eval(step_epochs)
        if not step_epochs:
            return optax.constant_schedule(base_lr)
        return stepped_schedule(base_lr, step_epochs, step_gamma, iters_per_epoch)
    if schedule_type == "cosine":
        return optax.cosine_decay_schedule(base_lr, decay_steps=max(total_iters, 1))
    if schedule_type == "poly":
        return polynomial_schedule(base_lr, total_iters, power=poly_power)
    raise ValueError(f"unknown schedule_type {schedule_type!r}")
