"""Loss-chain HBM-traffic probe on the real chip (VERDICT r2 item 2).

Times the fused mask_mt step at the honest paper recipe (DeepLab v2 R101,
bs10, 321^2, frozen BN) for four loss-chain variants in ONE process:

  baseline      f32 consistency chain, residuals saved (round-2 bench config)
  remat         remat_loss_chain=True (bit-exact math; softmax chains
                recomputed in backward instead of saving (B,H,W,C) residuals)
  bf16          cons_compute_dtype='bfloat16' (blended teacher logits ride
                HBM at half width; parity-flagged)
  bf16+remat    both
  softmax_bf16  loss_softmax_dtype='bfloat16' (the loss-side softmax chains
                themselves — sup log-softmax, cons softmax/diff, confidence
                softmax-max — run bf16; pixel sums accumulate f32).
                Parity basis: zero bf16-vs-f32 gate flips over 10.3M pixels
                at a converged teacher (voc_matched_pair/summary.json)
  all_bf16      every loss-chain lever on (VERDICT r4 item 6 adopt-or-refute)

and measures the bf16 confidence-gate flip fraction (pixels whose max-prob
gate at conf_thresh=0.97 differs between the f32 and bf16 chains) after a
short training run so the teacher's confidences are sharp, not random-init.

Timing discipline per the repo's measured axon pitfalls: host round-trip on a
scalar for sync, two warmup calls before timing, step-level numbers only.

    python scripts/loss_chain_probe.py --out results_evidence/loss_chain
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
WARMUP = 2
ITERS = 25


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_evidence/loss_chain")
    ap.add_argument("--train_steps", type=int, default=150,
                    help="steps of real training before the gate-flip "
                         "measurement (sharpens teacher confidence)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cutmix_seg_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import OptimizerConfig, create_train_state
    from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig
    from cutmix_seg_tpu.models.deeplab2 import resnet101_deeplab_imagenet
    from cutmix_seg_tpu.parallel.mesh import jit_sharded_step, make_mesh, shard_batch
    from cutmix_seg_tpu.semisup.mask_mt import (
        MaskConsistencyConfig,
        make_mask_mt_step,
    )

    model = resnet101_deeplab_imagenet(
        num_classes=NUM_CLASSES, dtype=jnp.bfloat16, pretrained=False)
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-5,
        lr_schedule=make_lr_schedule("none", 3e-5, 40_000))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(65, 65),
        mean_teacher=True, pretrained=False)

    common = dict(
        mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)), cons_weight=1.0,
        conf_thresh=0.97, conf_per_pixel=False, freeze_bn=True,
        mean_teacher=True, teacher_alpha=0.99, pallas_cutmix="off")
    variants = [
        ("baseline", {}),
        ("remat", dict(remat_loss_chain=True)),
        ("bf16", dict(cons_compute_dtype="bfloat16")),
        ("bf16+remat", dict(cons_compute_dtype="bfloat16",
                            remat_loss_chain=True)),
        ("softmax_bf16", dict(loss_softmax_dtype="bfloat16")),
        ("all_bf16", dict(cons_compute_dtype="bfloat16",
                          loss_softmax_dtype="bfloat16",
                          remat_loss_chain=True)),
    ]

    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    rng = np.random.RandomState(0)
    b = BATCH * n_chips
    batch = {
        "sup_x": rng.randn(b, CROP, CROP, 3).astype(np.float32),
        "sup_y": rng.randint(0, NUM_CLASSES, size=(b, CROP, CROP)).astype(
            np.int32),
        "um0": np.ones((b, CROP, CROP, 1), np.float32),
        "um1": np.ones((b, CROP, CROP, 1), np.float32),
    }
    for k in ("ux0", "ux1"):
        x = rng.randn(b, CROP, CROP, 3).astype(np.float32)
        batch[f"{k}_tea"] = x
        batch[f"{k}_stu"] = x
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
    ramp = jnp.float32(1.0)

    results = {}
    for name, kw in variants:
        step = jit_sharded_step(
            make_mask_mt_step(model, tx, MaskConsistencyConfig(**common, **kw)),
            mesh)
        t_c = time.perf_counter()
        for _ in range(WARMUP):
            state, metrics = step(state, batch, ramp)
            assert np.isfinite(float(metrics["sup_loss"]))  # scalar sync
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = step(state, batch, ramp)
        assert np.isfinite(float(metrics["sup_loss"]))  # scalar sync
        dt = time.perf_counter() - t0
        results[name] = {
            "step_ms": round(dt / ITERS * 1000.0, 2),
            "img_per_sec_per_chip": round(ITERS / dt * BATCH, 2),
            "warmup_s": round(compile_s, 1),
        }
        print(f"{name}: {results[name]}", file=sys.stderr, flush=True)

    # ---- bf16 confidence-gate flip fraction on a sharpened teacher ----
    step = jit_sharded_step(
        make_mask_mt_step(model, tx, MaskConsistencyConfig(**common)), mesh)
    for i in range(args.train_steps):
        state, metrics = step(state, batch, ramp)
        if (i + 1) % 50 == 0:
            assert np.isfinite(float(metrics["sup_loss"]))
    assert np.isfinite(float(metrics["sup_loss"]))

    from cutmix_seg_tpu.semisup.stepcore import apply_model

    def gate_stats(params, batch_stats, x):
        logits, _ = apply_model(model, params, batch_stats, x,
                                train=False, freeze_bn=True)
        conf32 = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1).max(axis=-1)
        conf16 = jax.nn.softmax(
            logits.astype(jnp.bfloat16).astype(jnp.float32), axis=-1
        ).max(axis=-1)
        g32 = conf32 >= common["conf_thresh"]
        g16 = conf16 >= common["conf_thresh"]
        return (g32 != g16).mean(), g32.mean(), conf32.mean()

    flip, rate, mean_conf = jax.jit(gate_stats)(
        state.teacher.params, state.teacher.batch_stats, batch["ux0_tea"])
    gate = {
        "gate_flip_fraction": float(np.asarray(flip)),
        "conf_rate_f32": float(np.asarray(rate)),
        "mean_max_prob": float(np.asarray(mean_conf)),
        "train_steps_before_measure": args.train_steps,
        "note": "fraction of pixels whose (max_prob >= 0.97) gate differs "
                "between the f32 and bf16 teacher-logit chains",
    }
    print(f"gate: {gate}", file=sys.stderr, flush=True)

    os.makedirs(args.out, exist_ok=True)
    out = {
        "recipe": "mask_mt DeepLab v2 R101 bs10 321^2 frozen-BN (paper "
                  "headline); one process, shared state, 2-call warmup, "
                  "25 timed iters, scalar host-round-trip sync",
        "device": str(jax.devices()[0]),
        "variants": results,
        "bf16_gate_analysis": gate,
    }
    path = os.path.join(args.out, "probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
