"""XLA:TPU compiler-option probe: the last unexplored perf dimension.

The repo's lever list for the mask_mt headline step (DeepLab v2 R101,
frozen BN, bs10, 321^2; reference: run_pascal_aug_experiments.sh:14-31) has
been closed by measurement at the program level — remat (+0.5%, adopted),
bf16 loss-side softmax chains (+1.5%, adopted), space-to-batch (0.994x,
refuted), pad-to-24 packing (refuted by the shape table's arithmetic),
shape alignment (structural: bs12 +16%). One dimension was never probed:
the TPU compiler's own options.

Transport note (measured, see results_evidence/xla_flag_sweep/probe.json
"transport"): on this host the TPU compile happens behind the axon tunnel,
and client-side XLA_FLAGS are parsed by the LOCAL client, which rejects
--xla_tpu_* flags (Unknown flag). The channel that reaches the remote TPU
compiler is PJRT ``compiler_options`` on the compile call — verified live:
a bogus option fails the remote compile, real options compile and run. So
this probe jits the SAME adopted bench recipe via
``jax.jit(...).lower(...).compile(compiler_options=...)`` per variant, all
in one process.

Variants: the latency-hiding scheduler toggle and the scoped-VMEM scratch
budget (80 MiB is the public MaxText setting for v5e; 112 MiB probes the
upper end) — the two single-chip knobs with plausible effect on a
conv-dominated single-stream step.

Timing discipline matches bench.py / scripts/shape_probe.py: 3-call warmup
with a scalar host-round-trip sync each call, 15 timed iters, step-level
numbers only. A variant that fails to compile is recorded as failed rather
than aborting the sweep.

    python scripts/xla_flag_probe.py --out results_evidence/xla_flag_sweep
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CLASSES = 21
BATCH = 10
CROP = 321
WARMUP = 3
ITERS = 15

# name -> PJRT compiler_options for the TPU compile
VARIANTS = {
    # the shipped configuration (no overrides)
    "baseline": {},
    # latency-hiding scheduler: defaults on in current XLA:TPU; flipping it
    # off tests whether its schedule helps or hurts this single-stream step
    "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "False"},
    # scoped-VMEM scratch budget: larger budgets can admit wider conv
    # fusions / deeper double-buffering
    "vmem_80mib": {"xla_tpu_scoped_vmem_limit_kib": "81920"},
    "vmem_112mib": {"xla_tpu_scoped_vmem_limit_kib": "114688"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_evidence/xla_flag_sweep")
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
    from cutmix_seg_tpu.models.deeplab2 import resnet101_deeplab_imagenet
    from cutmix_seg_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated,
        shard_batch,
    )
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
    # the ADOPTED bench recipe (remat + bf16 loss-side softmax chains)
    cfg = MaskConsistencyConfig(
        mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)), cons_weight=1.0,
        conf_thresh=0.97, conf_per_pixel=False, freeze_bn=True,
        mean_teacher=True, teacher_alpha=0.99, pallas_cutmix="off",
        remat_loss_chain=True, loss_softmax_dtype="bfloat16")

    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    repl, data = replicated(mesh), batch_sharding(mesh)
    step_fn = make_mask_mt_step(model, tx, cfg)
    # NO donation: every variant re-executes from the same state buffers
    jitted = jax.jit(step_fn, in_shardings=(repl, data, repl),
                     out_shardings=(repl, repl))

    rng = np.random.RandomState(0)
    b = BATCH * n_chips
    batch = {
        "sup_x": rng.randn(b, CROP, CROP, 3).astype(np.float32),
        "sup_y": rng.randint(
            0, NUM_CLASSES, size=(b, CROP, CROP)).astype(np.int32),
        "um0": np.ones((b, CROP, CROP, 1), np.float32),
        "um1": np.ones((b, CROP, CROP, 1), np.float32),
    }
    for k in ("ux0", "ux1"):
        x = rng.randn(b, CROP, CROP, 3).astype(np.float32)
        batch[f"{k}_tea"] = x
        batch[f"{k}_stu"] = x
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
    ramp = jnp.float32(1.0)

    lowered = jitted.lower(state, batch, ramp)

    results = {}
    for name, opts in VARIANTS.items():
        print(f"xla_flag_probe: {name} {opts or '(no overrides)'}",
              file=sys.stderr, flush=True)
        try:
            t_c = time.perf_counter()
            compiled = lowered.compile(
                compiler_options=opts if opts else None)
            compile_s = time.perf_counter() - t_c
            st = state
            for _ in range(WARMUP):
                st, metrics = compiled(st, batch, ramp)
                loss = float(metrics["sup_loss"])
                if not np.isfinite(loss):
                    raise RuntimeError(f"non-finite sup_loss: {loss}")
            t0 = time.perf_counter()
            for _ in range(ITERS):
                st, metrics = compiled(st, batch, ramp)
            loss = float(metrics["sup_loss"])
            if not np.isfinite(loss):
                raise RuntimeError(f"non-finite sup_loss: {loss}")
            dt = time.perf_counter() - t0
            step_ms = dt / ITERS * 1000.0
            results[name] = {
                "compiler_options": opts,
                "step_ms": round(step_ms, 2),
                "img_per_sec_per_chip": round(ITERS / dt * BATCH, 2),
                "compile_s": round(compile_s, 1),
                "sup_loss_after_warmup_and_iters": loss,
            }
            print(f"  -> {step_ms:.2f} ms/step", file=sys.stderr, flush=True)
        except Exception as e:  # record and continue
            results[name] = {
                "compiler_options": opts,
                "failed": True,
                "error": f"{type(e).__name__}: {str(e)[:500]}",
            }
            print(f"  -> FAILED {type(e).__name__}", file=sys.stderr,
                  flush=True)

    base_ms = results.get("baseline", {}).get("step_ms")
    for r in results.values():
        if base_ms and not r.get("failed"):
            r["vs_baseline"] = round(base_ms / r["step_ms"], 4)

    out = {
        "recipe": "mask_mt DeepLab v2 R101 frozen-BN mix, bs10 crop321, the "
                  "ADOPTED bench recipe (remat_loss_chain + bf16 loss-side "
                  "softmax); one lowered program compiled per "
                  "compiler_options variant, 3-call synced warmup, 15 timed "
                  "iters, no donation (shared input state)",
        "device": str(jax.devices()[0]),
        "transport": "client-side XLA_FLAGS cannot carry --xla_tpu_* here "
                     "(the axon tunnel's local client rejects them: "
                     "'Unknown flag in XLA_FLAGS'); PJRT compiler_options "
                     "reach the remote TPU compiler — verified by a bogus "
                     "option failing the remote compile while real options "
                     "compile and run",
        "variants": results,
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
