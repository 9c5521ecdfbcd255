"""Train-state pytree and the two-group optimizer.

The train state bundles everything a fused step mutates, so one jitted XLA
program advances the whole system: student {params, batch_stats}, teacher
{params, batch_stats} (EMA copy; aliases the student in pi-model mode), optax
optimizer state, the global step and the PRNG key. The reference keeps these
in four separate host objects and two backward passes
(reference: train_seg_semisup_mask_mt.py:90-109,290-467); here they advance
together under jit, with gradients of ``sup_loss + w * cons_loss`` (identical
to the reference's two summed backwards).

Optimizer parity: Adam/SGD with two parameter groups — pretrained at 0.1x LR,
new at 1x (reference: train_seg_semisup_mask_mt.py:90-98) — plus a 'frozen'
group (BN affine params in DeepLab) that receives zero updates, expressed with
optax.multi_transform over the model's param labels.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class ModelState:
    params: Any
    batch_stats: Any  # empty dict when the arch has no BN running stats


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    student: ModelState
    teacher: ModelState  # == student in pi-model mode (kept in sync)
    opt_state: Any
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    opt_type: str = "adam"  # 'adam' | 'sgd'
    learning_rate: float = 1e-4
    sgd_momentum: float = 0.9
    sgd_nesterov: bool = False
    sgd_weight_decay: float = 5e-4
    lr_schedule: Optional[Callable] = None  # step -> lr; default constant


def make_optimizer(cfg: OptimizerConfig, param_labels) -> optax.GradientTransformation:
    sched = cfg.lr_schedule or (lambda step: cfg.learning_rate)

    def group(scale: float):
        scaled = lambda step: sched(step) * scale
        if cfg.opt_type == "adam":
            return optax.chain(
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(scaled),
            )
        if cfg.opt_type == "sgd":
            parts = []
            if cfg.sgd_weight_decay:
                parts.append(optax.add_decayed_weights(cfg.sgd_weight_decay))
            if cfg.sgd_momentum:
                parts.append(
                    optax.trace(decay=cfg.sgd_momentum, nesterov=cfg.sgd_nesterov)
                )
            parts.append(optax.scale_by_learning_rate(scaled))
            return optax.chain(*parts)
        raise ValueError(f"unknown opt_type {cfg.opt_type!r}")

    return optax.multi_transform(
        {
            "pretrained": group(0.1),
            "new": group(1.0),
            "frozen": optax.set_to_zero(),
        },
        param_labels,
    )


def create_train_state(
    model,
    opt_cfg: OptimizerConfig,
    rng: jax.Array,
    input_hw=(97, 97),
    mean_teacher: bool = True,
    pretrained: bool = True,
) -> tuple[TrainState, optax.GradientTransformation]:
    """Initialise the full train state for a SegModel.

    ``input_hw`` only shapes the init trace (parameter shapes are
    spatial-size independent); it is rounded up to the model's block size so
    encoder/decoder skip resolutions line up for U-Net-family models
    (DenseUNet/ResUNet have block_size (32, 32); an odd init size crashes
    their additive skips)."""
    k_init, k_state = jax.random.split(rng)
    bh, bw = getattr(model, "block_size", (1, 1))
    input_hw = (-(-input_hw[0] // bh) * bh, -(-input_hw[1] // bw) * bw)
    variables = model.init(k_init, input_hw=input_hw)
    if pretrained and model.load_pretrained is not None:
        variables = model.load_pretrained(variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    labels = model.param_label(params)
    tx = make_optimizer(opt_cfg, labels)
    opt_state = tx.init(params)

    student = ModelState(params=params, batch_stats=batch_stats)
    if mean_teacher:
        # distinct buffers (not aliases) so the step can donate the state
        teacher = ModelState(
            params=jax.tree_util.tree_map(jnp.copy, params),
            batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        )
    else:
        # pi-model: the teacher IS the student; keep an empty placeholder so
        # no buffers alias across the donated state
        teacher = ModelState(params={}, batch_stats={})
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        student=student,
        teacher=teacher,
        opt_state=opt_state,
        rng=k_state,
    )
    return state, tx
