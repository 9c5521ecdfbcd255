"""Serving-path benchmark: AOT-exported artifact inference throughput on TPU.

Exports the flagship DeepLab v2 R101 as a serving artifact (uint8 image ->
int32 label map, weights baked in, symbolic batch), loads it back the way a
serving host would (jax only), and measures end-to-end inference throughput
at several batch sizes on the real chip.

Usage:
    python scripts/serve_bench.py [--hw 321,321] [--batches 1,4,8,16]
        [--out results_evidence/serving/serve_bench.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def note(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="321,321")
    ap.add_argument("--batches", default="1,4,8,16")
    ap.add_argument("--num_classes", type=int, default=21)
    ap.add_argument("--arch", default="resnet101_deeplab_imagenet",
                    help="any registry arch name (e.g. densenet161unet_imagenet)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=1,
                    help="measure each batch size this many times (min is "
                         "reported, all samples recorded) — separates real "
                         "throughput shape from tunnel-dispatch noise")
    ap.add_argument("--concrete", default="",
                    help="comma list of batch sizes to ALSO measure as a "
                         "direct concrete-shape jit of the same serving fn "
                         "(isolates symbolic-batch lowering artifacts)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--artifact", default="/tmp/serve_bench.jaxexport")
    args = ap.parse_args()

    import jax
    import numpy as np

    import jax.numpy as jnp
    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import OptimizerConfig, create_train_state
    from cutmix_seg_tpu.models import registry
    from cutmix_seg_tpu.serve.export import (
        export_serving_artifact,
        load_serving_artifact,
    )

    hw = tuple(int(v) for v in args.hw.split(","))
    batches = [int(v) for v in args.batches.split(",")]

    note(f"serve_bench: building {args.arch} + exporting at {hw}...")
    import inspect

    factory = registry.get(args.arch)
    kwargs = {"num_classes": args.num_classes, "dtype": jnp.bfloat16}
    # not every registry factory takes `pretrained` (e.g. densenet161unet)
    if "pretrained" in inspect.signature(factory).parameters:
        kwargs["pretrained"] = False
    model = factory(**kwargs)
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=1e-4,
        lr_schedule=make_lr_schedule("none", 1e-4, 10))
    state, _ = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(65, 65),
        mean_teacher=False, pretrained=False)
    t0 = time.perf_counter()
    export_serving_artifact(model, state.student, hw, args.artifact,
                            num_classes=args.num_classes)
    note(f"serve_bench: exported in {time.perf_counter() - t0:.1f}s "
         f"({os.path.getsize(args.artifact) / 1e6:.1f} MB)")

    call, meta = load_serving_artifact(args.artifact)
    rng = np.random.RandomState(0)
    results = {"arch": args.arch, "hw": list(hw),
               "platform": jax.devices()[0].platform,
               "artifact_mb": round(os.path.getsize(args.artifact) / 1e6, 1),
               "batches": {}}
    import jax as _jax

    def measure(fn, b, label):
        """Time fn at batch b with DEVICE-RESIDENT inputs (headline numbers)
        and, for diagnostics, with host numpy inputs.

        Device-resident input is the production-representative measurement:
        a real TPU serving host feeds inputs over PCIe (sub-ms for these
        uint8 batches), while THIS environment reaches the chip through a
        low/variable-bandwidth tunnel whose host->device input transfer
        dominates and super-linearises the latency curve (measured round 3:
        the round-2 'batch-8 dip' was entirely this transfer — see
        results_evidence/serving/report.md)."""
        x = rng.randint(0, 256, size=(b,) + hw + (3,)).astype(np.uint8)
        xd = _jax.device_put(x)
        t0 = time.perf_counter()
        out = fn(xd)
        assert int(np.asarray(out).max()) < args.num_classes
        note(f"serve_bench: {label} b={b} first call (compile) "
             f"{time.perf_counter() - t0:.1f}s")
        np.asarray(fn(xd))  # second warmup call before timing

        def timed(inp):
            samples = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(inp)
                np.asarray(out)  # sync
                samples.append(time.perf_counter() - t0)
            return samples

        dev = timed(xd)
        host = timed(x)
        dt = min(dev)
        img_s = args.iters * b / dt
        ms = 1000.0 * dt / args.iters
        host_ms = 1000.0 * min(host) / args.iters
        rec = {
            "images_per_sec": round(img_s, 1),
            "latency_ms": round(ms, 2),
            "tunnel_host_input_latency_ms": round(host_ms, 2),
        }
        if args.repeats > 1:
            rec["latency_ms_samples"] = [
                round(1000.0 * s / args.iters, 2) for s in dev]
            rec["tunnel_host_input_samples"] = [
                round(1000.0 * s / args.iters, 2) for s in host]
        note(f"serve_bench: {label} b={b}: {img_s:.1f} img/s, "
             f"{ms:.2f} ms/call device-input "
             f"({host_ms:.2f} ms host-input through tunnel)")
        return rec

    for b in batches:
        results["batches"][str(b)] = measure(call, b, "artifact")

    if args.concrete:
        from cutmix_seg_tpu.serve.export import make_serving_fn

        cjit = _jax.jit(make_serving_fn(model, state.student))
        results["concrete_jit_batches"] = {}
        for b in [int(v) for v in args.concrete.split(",")]:
            results["concrete_jit_batches"][str(b)] = measure(
                cjit, b, "concrete-jit")

    print(json.dumps(results, indent=1))
    if args.out:
        out_dir = os.path.dirname(args.out)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        note(f"serve_bench: wrote {args.out}")


if __name__ == "__main__":
    main()
