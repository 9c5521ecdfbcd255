"""Space-to-batch dilated-conv lowering: measured adopt-or-refute probe.

The round-2/3 MFU forensics flagged the OS8 dilated 3x3 convs (layer3 d=2,
layer4 d=4) as the step's least efficient ops (isolated ~21.7 TFLOPS;
results_evidence/mfu_profile.json) and named space-to-batch as the untried
structural lever. models/resnet.py now carries the lever
(``dilated_impl='s2b'``: the d*d dilation phases batched through a dense
3x3 conv — same math, same parameter tree, different TPU tiling;
numerically equal to the direct lowering to ~1e-11).

This probe times the FULL fused mask_mt step (DeepLab v2 R101, bs10, 321^2,
frozen BN — bench.py's honest recipe) for both lowerings in one process and
asserts their logits agree, producing the adopt-or-refute table.

    python scripts/space_to_batch_probe.py --out results_evidence/space_to_batch
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 10
CROP = 321
NUM_CLASSES = 21
WARMUP = 3
ITERS = 20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_evidence/space_to_batch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cutmix_seg_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        OptimizerConfig,
        create_train_state,
    )
    from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.models.deeplab2 import (
        DeepLab2,
        _param_label,
        resnet101_deeplab_imagenet,
    )
    from cutmix_seg_tpu.parallel.mesh import (
        jit_sharded_step,
        make_mesh,
        shard_batch,
    )
    from cutmix_seg_tpu.semisup.mask_mt import (
        MaskConsistencyConfig,
        make_mask_mt_step,
    )

    base = resnet101_deeplab_imagenet(num_classes=NUM_CLASSES,
                                      dtype=jnp.bfloat16, pretrained=False)
    s2b = SegModel(
        name=base.name + "_s2b",
        module=DeepLab2(num_classes=NUM_CLASSES, dtype=jnp.bfloat16,
                        dilated_impl="s2b"),
        mean=base.mean, std=base.std, block_size=base.block_size,
        param_label=_param_label, load_pretrained=None)

    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-5,
        lr_schedule=make_lr_schedule("none", 3e-5, 40_000))
    state, tx = create_train_state(
        base, opt_cfg, jax.random.PRNGKey(0), input_hw=(65, 65),
        mean_teacher=True, pretrained=False)
    cfg = MaskConsistencyConfig(
        mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)), cons_weight=1.0,
        conf_thresh=0.97, conf_per_pixel=False, freeze_bn=True,
        mean_teacher=True, teacher_alpha=0.99, pallas_cutmix="off",
        remat_loss_chain=True)

    if jax.process_count() > 1:
        raise SystemExit("single-process probe")
    mesh = make_mesh(len(jax.devices()))

    rng = np.random.RandomState(0)
    b = BATCH * len(jax.devices())
    batch = {
        "sup_x": rng.randn(b, CROP, CROP, 3).astype(np.float32),
        "sup_y": rng.randint(0, NUM_CLASSES,
                             size=(b, CROP, CROP)).astype(np.int32),
        "um0": np.ones((b, CROP, CROP, 1), np.float32),
        "um1": np.ones((b, CROP, CROP, 1), np.float32),
    }
    for k in ("ux0", "ux1"):
        x = rng.randn(b, CROP, CROP, 3).astype(np.float32)
        batch[f"{k}_tea"] = x
        batch[f"{k}_stu"] = x
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
    ramp = jnp.float32(1.0)

    # same-weights forward equivalence on device (bf16 compute)
    x_small = jnp.asarray(rng.randn(2, 65, 65, 3).astype(np.float32))
    lo_d = base.module.apply(
        {"params": state.student.params,
         "batch_stats": state.student.batch_stats},
        x_small, train=False)
    lo_s = s2b.module.apply(
        {"params": state.student.params,
         "batch_stats": state.student.batch_stats},
        x_small, train=False)
    fwd_diff = float(jnp.abs(lo_d.astype(jnp.float32)
                             - lo_s.astype(jnp.float32)).max())
    print(f"forward |direct - s2b| max: {fwd_diff:.2e}", file=sys.stderr,
          flush=True)

    results = {}
    for name, model in (("direct", base), ("s2b", s2b)):
        step = jit_sharded_step(make_mask_mt_step(model, tx, cfg), mesh)
        # the sharded step donates its state argument, so each variant needs
        # a fresh state (same PRNGKey -> identical initialisation)
        st, _ = create_train_state(
            base, opt_cfg, jax.random.PRNGKey(0), input_hw=(65, 65),
            mean_teacher=True, pretrained=False)
        t_c = time.perf_counter()
        for _ in range(WARMUP):
            st, metrics = step(st, batch, ramp)
            loss = float(metrics["sup_loss"])
            if not np.isfinite(loss):
                raise RuntimeError(f"non-finite loss {loss}")
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st, metrics = step(st, batch, ramp)
        loss = float(metrics["sup_loss"])  # host round-trip sync
        if not np.isfinite(loss):
            raise RuntimeError(f"non-finite loss {loss}")
        dt = time.perf_counter() - t0
        results[name] = {
            "step_ms": round(dt / ITERS * 1000.0, 2),
            "img_per_sec_per_chip": round(ITERS / dt * BATCH, 2),
            "warmup_s": round(compile_s, 1),
        }
        print(f"{name}: {results[name]}", file=sys.stderr, flush=True)

    os.makedirs(args.out, exist_ok=True)
    out = {
        "recipe": "mask_mt DeepLab v2 R101 frozen-BN mix, bs10 321^2 "
                  "(bench.py honest recipe incl. remat_loss_chain); one "
                  "process, shared initial state, 3-call warmup, 20 timed "
                  "iters, scalar host-round-trip sync",
        "device": str(jax.devices()[0]),
        "forward_max_abs_diff_bf16": fwd_diff,
        "variants": results,
        "speedup_s2b_vs_direct": round(
            results["direct"]["step_ms"] / results["s2b"]["step_ms"], 4),
    }
    with open(os.path.join(args.out, "probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
