"""Reproducible MFU profile of the headline train step on the local chip.

Measures, on the default backend:
  1. step-level effective TFLOP/s of the fully-fused CutMix mean-teacher
     step at the paper recipe (DeepLab v2 R101, bs10, 321^2), using XLA's
     own cost analysis for the FLOP count and a host-round-trip-synced
     timing loop;
  2. forward per-op ceilings for the recipe's dominant convolutions
     (3x3 dilated-2 256ch, dilated-4 512ch, dense 3x3 control, all at the
     OS8 41^2 internal resolution, batch 20 = the step's 2xbs sub-batch),
     measured as a serial chain of convs inside ONE program so remote
     per-dispatch latency cannot pollute the numbers.

Writes results_evidence/mfu_profile.json. The step-level number (XLA's own
FLOP count / measured wall-clock) is the headline evidence for the
"~43-46% of v5e bf16 peak" claim in IMPLEMENTATION_STATUS.md.

Caveat recorded in the artifact: ISOLATED conv timings are 3-4x slower than
the same ops run in-model (86 TFLOP/s step average vs 20-58 TFLOP/s
isolated, across serial-chain and independent-unrolled harnesses) - XLA's
layout assignment in graph context matters that much. Treat isolated per-op
"ceilings" as harness artifacts, not op costs.

Run: python scripts/mfu_profile.py          (~10 min incl. compiles)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_BF16_PEAK_TFLOPS = 197.0


def sync(x):
    """Host round-trip: the only reliable sync on the axon platform."""
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def time_fn(fn, *args, n=3):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def step_level():
    """The bench step: time + XLA-reported flops."""
    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        OptimizerConfig,
        create_train_state,
    )
    from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig
    from cutmix_seg_tpu.models.deeplab2 import resnet101_deeplab_imagenet
    from cutmix_seg_tpu.parallel.mesh import (
        jit_sharded_step,
        make_mesh,
        shard_batch,
    )
    from cutmix_seg_tpu.semisup.mask_mt import (
        MaskConsistencyConfig,
        make_mask_mt_step,
    )

    model = resnet101_deeplab_imagenet(num_classes=21, dtype=jnp.bfloat16,
                                       pretrained=False)
    opt_cfg = OptimizerConfig(opt_type="adam", learning_rate=3e-5,
                              lr_schedule=make_lr_schedule("none", 3e-5, 1000))
    state, tx = create_train_state(model, opt_cfg, jax.random.PRNGKey(0),
                                   input_hw=(65, 65), mean_teacher=True,
                                   pretrained=False)
    cfg = MaskConsistencyConfig(mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)),
                                cons_weight=1.0, conf_thresh=0.97,
                                freeze_bn=True, mean_teacher=True,
                                pallas_cutmix="off")
    mesh = make_mesh(1)
    step = jit_sharded_step(make_mask_mt_step(model, tx, cfg), mesh)

    rng = np.random.RandomState(0)
    b, hw = 10, 321
    batch = {
        "sup_x": rng.randn(b, hw, hw, 3).astype(np.float32),
        "sup_y": rng.randint(0, 21, size=(b, hw, hw)).astype(np.int32),
        "um0": np.ones((b, hw, hw, 1), np.float32),
        "um1": np.ones((b, hw, hw, 1), np.float32),
    }
    for k in ("ux0", "ux1"):
        x = rng.randn(b, hw, hw, 3).astype(np.float32)
        batch[f"{k}_tea"] = x
        batch[f"{k}_stu"] = x
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
    ramp = jnp.float32(1.0)

    lowered = step.lower(state, batch, ramp)
    compiled = lowered.compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        print(f"cost_analysis unavailable ({e}); step TFLOPS omitted",
              file=sys.stderr)

    # the step donates its state argument: thread the returned state through
    # warmup and the timing loop
    s, metrics = compiled(state, batch, ramp)
    sync(metrics)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        s, metrics = compiled(s, batch, ramp)
    sync(metrics)
    dt = (time.perf_counter() - t0) / n

    out = {"step_ms": round(dt * 1e3, 2),
           "img_per_sec_per_chip": round(b / dt, 1)}
    if flops:
        out["xla_flops_per_step"] = flops
        out["effective_tflops"] = round(flops / dt / 1e12, 1)
        out["pct_of_v5e_bf16_peak"] = round(
            100 * flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS, 1)
    return out


def conv_ceilings():
    """Isolated convs at the recipe's dominant shapes (see module caveat)."""
    results = {}
    loop = 20
    for name, (ch, dil) in {
        "3x3_d2_256ch_41sq_b20": (256, 2),
        "3x3_d4_512ch_41sq_b20": (512, 4),
        "3x3_dense_256ch_41sq_b20": (256, 1),
    }.items():
        # `loop` INDEPENDENT convs on distinct inputs, unrolled in one
        # program: mirrors how the ops sit in the real model (XLA may
        # pipeline them, exactly as it does between layers). A serial
        # carry-chain (conv(conv(...))) measures 4-5x slower here because
        # the loop carry forces a layout round-trip per iteration - that is
        # a harness artifact, not the model's op cost.
        xs = jax.random.normal(jax.random.PRNGKey(0), (loop, 20, 41, 41, ch),
                               jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, ch, ch),
                               jnp.bfloat16)
             * float(1.0 / np.sqrt(9 * ch)))  # python float: stays bf16

        def many(xs, w):
            outs = [jax.lax.conv_general_dilated(
                        xs[i], w, (1, 1), "SAME", rhs_dilation=(dil, dil),
                        dimension_numbers=("NHWC", "HWIO", "NHWC")).mean()
                    for i in range(loop)]
            # scalar result: sync() must not drag a 17 MB activation
            # through the remote tunnel (that dominates the timing otherwise)
            return sum(outs)

        f = jax.jit(many)
        t = time_fn(f, xs, w)
        flops = 2 * 20 * 41 * 41 * 9 * ch * ch * loop
        results[name] = {"ms_per_op": round(t * 1e3 / loop, 3),
                         "tflops": round(flops / t / 1e12, 1)}
        print(name, results[name], flush=True)
    return results


def main():
    global jax, jnp
    import cutmix_seg_tpu  # noqa: F401  (JAX_PLATFORMS mirror)
    import jax
    import jax.numpy as jnp

    from cutmix_seg_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "v5e_bf16_peak_tflops": V5E_BF16_PEAK_TFLOPS}
    print("measuring isolated conv micro-bench (see caveat)...", flush=True)
    out["isolated_conv_microbench"] = conv_ceilings()
    out["isolated_conv_caveat"] = (
        "isolated convs time 3-4x slower than the same ops inside the "
        "compiled model (layout/pipelining context); the step-level "
        "effective_tflops below is the meaningful utilisation number")
    print("measuring full step...", flush=True)
    out["full_step"] = step_level()
    print(json.dumps(out["full_step"]))
    path = os.path.join(os.path.dirname(__file__), "..",
                        "results_evidence", "mfu_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", os.path.normpath(path))


if __name__ == "__main__":
    main()
