"""Per-op time breakdown of the headline step from a jax.profiler trace.

The MFU forensics (scripts/mfu_profile.py) give one number — ~44% of v5e
bf16 peak at the paper recipe — and the shape table proves the bs10 gap is
sublane padding. This script answers the next question with data: WHERE the
remaining step time lives, op by op. It captures a jax.profiler trace of
the adopted bench recipe (mask_mt DeepLab v2 R101, frozen BN, bs10, 321^2;
reference: run_pascal_aug_experiments.sh:14-31), parses the XPlane protos
with tensorflow's profiler protobufs (no tensorboard UI needed), and emits:

  - total device-busy time per step vs wall step time (gap = scheduling /
    host / transfer bubbles),
  - the top-K XLA ops by summed device self-time with their share,
  - category totals (convolution fusions, other fusions, copies/transposes,
    all-reduce, infeed/outfeed, misc).

    python scripts/op_breakdown.py --out results_evidence/op_breakdown

Use --parse_only <logdir> to re-parse an existing trace directory.
"""

import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CLASSES = 21
BATCH = 10
CROP = 321
WARMUP = 3
TRACE_ITERS = 10


def capture(logdir):
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
        jit_sharded_step,
        make_mesh,
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
    cfg = MaskConsistencyConfig(
        mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)), cons_weight=1.0,
        conf_thresh=0.97, conf_per_pixel=False, freeze_bn=True,
        mean_teacher=True, teacher_alpha=0.99, pallas_cutmix="off",
        remat_loss_chain=True, loss_softmax_dtype="bfloat16")

    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    step = jit_sharded_step(make_mask_mt_step(model, tx, cfg), mesh)

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

    def sync(metrics):
        loss = float(metrics["sup_loss"])
        if not np.isfinite(loss):
            raise RuntimeError(f"non-finite sup_loss: {loss}")

    for _ in range(WARMUP):
        state, metrics = step(state, batch, ramp)
        sync(metrics)

    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    for _ in range(TRACE_ITERS):
        state, metrics = step(state, batch, ramp)
    sync(metrics)
    jax.profiler.stop_trace()
    wall_s = time.perf_counter() - t0
    return {
        "traced_iters": TRACE_ITERS,
        "wall_ms_per_step_during_trace": round(wall_s / TRACE_ITERS * 1e3, 2),
        "device": str(jax.devices()[0]),
    }


def parse(logdir, traced_iters):
    """Aggregate the device plane's "XLA Ops" line by op and by XLA's own
    ``hlo_category`` stat across all xplane.pb files under ``logdir``.

    The device plane carries several OVERLAPPING timelines of the same wall
    interval ("Steps", "XLA Modules", "XLA Ops", "Async XLA Ops",
    "TC Overlay"); summing them all would count each op several times over.
    Only the per-op line is additive, and its event metadata carries the
    compiler's own category / flops / bytes_accessed stats — far more
    trustworthy than regexing HLO text.
    """
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # older/newer TF layouts
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")

    per_op = {}   # display_name -> [ps, flops, bytes]
    per_cat = {}  # hlo_category -> [ps, flops, bytes]
    planes_seen = []
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            planes_seen.append(
                {"name": plane.name,
                 "lines": [ln.name for ln in plane.lines][:12]})
            if not plane.name.startswith("/device:TPU"):
                continue
            stat_names = {i: m.name for i, m in plane.stat_metadata.items()}

            def meta_stats(em):
                out = {"hlo_category": "uncategorised", "flops": 0,
                       "bytes_accessed": 0}
                for st in em.stats:
                    nm = stat_names.get(st.metadata_id)
                    if nm == "hlo_category":
                        out[nm] = st.str_value
                    elif nm in ("flops", "bytes_accessed"):
                        out[nm] = st.int64_value
                return out

            op_lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
            for line in op_lines:
                for ev in line.events:
                    em = plane.event_metadata[ev.metadata_id]
                    info = meta_stats(em)
                    name = em.display_name or em.name
                    dur = ev.duration_ps
                    for store, key in ((per_op, name),
                                       (per_cat, info["hlo_category"])):
                        acc = store.setdefault(key, [0, 0, 0])
                        acc[0] += dur
                        acc[1] += info["flops"]
                        acc[2] += info["bytes_accessed"]

    total_ps = sum(v[0] for v in per_op.values())
    total_flops = sum(v[1] for v in per_op.values())
    top = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:40]

    def row(name, acc):
        ps, flops, byts = acc
        r = {"name": name,
             "ms_per_step": round(ps / 1e9 / traced_iters, 3),
             "pct_of_device_busy": round(100.0 * ps / total_ps, 2)}
        if ps > 0:
            r["tflops_per_s"] = round(flops / (ps / 1e12) / 1e12, 2)
            r["hbm_gb_per_s"] = round(byts / (ps / 1e12) / 1e9, 1)
        return r

    return {
        "n_xplane_files": len(paths),
        "planes": planes_seen[:8],
        "device_busy_ms_per_step": round(total_ps / 1e9 / traced_iters, 2),
        "achieved_tflops_per_s_over_busy": round(
            total_flops / (total_ps / 1e12) / 1e12, 2),
        "category_breakdown": [
            row(cat, acc) for cat, acc in
            sorted(per_cat.items(), key=lambda kv: -kv[1][0])],
        "top_ops": [row(name, acc) for name, acc in top],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_evidence/op_breakdown")
    ap.add_argument("--parse_only", default=None,
                    help="existing profiler logdir to re-parse")
    ap.add_argument("--traced_iters", type=int, default=TRACE_ITERS)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.parse_only:
        logdir = args.parse_only
        meta = {"traced_iters": args.traced_iters, "reparsed": True}
    else:
        logdir = os.path.join(args.out, "trace")
        meta = capture(logdir)
        print(f"capture done: {meta}", file=sys.stderr, flush=True)

    parsed = parse(logdir, meta["traced_iters"])
    out = {
        "recipe": "mask_mt DeepLab v2 R101 frozen-BN mix, bs10 crop321, the "
                  "ADOPTED bench recipe (remat + bf16 loss-side softmax); "
                  f"{meta['traced_iters']} traced steps after 3 synced "
                  "warmup calls",
        **meta,
        **parsed,
    }
    path = os.path.join(args.out, "probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("device_busy_ms_per_step",
                       "achieved_tflops_per_s_over_busy")}))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
