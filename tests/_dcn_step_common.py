"""Shared construction for the DCN full-train-step test (not a test module).

Builds the SAME reduced-depth DeepLab v2 CutMix mean-teacher fused step,
train state, and deterministic global batch on every caller — the two DCN
child processes and the single-process reference — so one sharded train step
executed across a 2-process boundary can be compared number-for-number
against the identical program on a single-process 8-device mesh.

The reference has no distributed counterpart (single hardcoded cuda:0,
reference: train_seg_semisup_mask_mt.py:58); this exercises the SURVEY §5
distributed row end-to-end: grads/metrics reduced across DCN by XLA
collectives inside ONE fused program.
"""

import jax
import numpy as np

GLOBAL_BATCH = 8
# 32 rows: divisible by the 4-way H-shard of the spatial-train test (sharded
# dims must divide exactly; jax rejects uneven device_put shardings)
HW = 32
N_CLASSES = 5


def build_step_and_state(mesh):
    """(model, state, step_fn) — tiny DeepLab v2 mask_mt step on `mesh`."""
    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        OptimizerConfig,
        create_train_state,
    )
    from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.semisup.mask_mt import (
        MaskConsistencyConfig,
        make_mask_mt_step,
    )

    module = DeepLab2(num_classes=N_CLASSES, layers=(1, 1, 1, 1))
    model = SegModel(
        name="deeplab2_dcn",
        module=module,
        mean=np.zeros(3),
        std=np.ones(3),
        block_size=(1, 1),
        param_label=_param_label,
    )
    opt_cfg = OptimizerConfig(
        opt_type="adam",
        learning_rate=3e-5,
        lr_schedule=make_lr_schedule("none", 3e-5, 100),
    )
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(HW, HW),
        mean_teacher=True, pretrained=False,
    )
    step = make_mask_mt_step(
        model, tx,
        MaskConsistencyConfig(
            mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)),
            pallas_cutmix="off", cons_weight=1.0, conf_thresh=0.97,
            freeze_bn=True, mean_teacher=True),
        mesh=mesh)
    return model, state, step


def global_batch():
    """Deterministic global batch; every caller reconstructs it identically
    and slices out its own process rows."""
    rng = np.random.RandomState(7)
    b, h, w = GLOBAL_BATCH, HW, HW
    batch = {
        "sup_x": rng.randn(b, h, w, 3).astype(np.float32),
        "sup_y": rng.randint(0, N_CLASSES, size=(b, h, w)).astype(np.int32),
        "um0": np.ones((b, h, w, 1), np.float32),
        "um1": np.ones((b, h, w, 1), np.float32),
    }
    for k in ("ux0", "ux1"):
        x = rng.randn(b, h, w, 3).astype(np.float32)
        batch[f"{k}_tea"] = x
        batch[f"{k}_stu"] = x
    return batch


def run_two_steps(mesh, state, step, batch_arrays):
    """jit the step on `mesh`, run two chained steps, return final metrics."""
    import jax.numpy as jnp

    from cutmix_seg_tpu.parallel.mesh import jit_sharded_step, replicated

    jstep = jit_sharded_step(step, mesh)
    state = jax.device_put(state, replicated(mesh))
    for _ in range(2):
        state, metrics = jstep(state, batch_arrays, jnp.float32(1.0))
    jax.block_until_ready(metrics)
    return state, metrics
