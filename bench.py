"""Headline benchmark: CutMix mean-teacher training throughput on TPU.

Measures the fully-fused train step (student fwd/bwd on sup + mixed unsup
batches, two teacher forwards, on-device mask gen + CutMix blend, confidence
threshold + consistency loss, Adam update, EMA) for DeepLab v2 ResNet-101 in
the paper's Pascal-VOC configuration: batch 10 supervised + 10+10
unsupervised, 321x321 crops, frozen BN — the reference's headline experiment
(reference: run_pascal_aug_experiments.sh:14-31,
train_seg_semisup_mask_mt.py:287-467).

Metric: train images/sec/chip, counted as batch_size (10) supervised-equiv
images per optimizer step — i.e. iterations/sec * 10, the number used to turn
"40 epochs x 1000 iters" into wall-clock. The reference publishes no
throughput number (it prints only wall-clock per epoch), so vs_baseline is
measured against REFERENCE_IMG_PER_SEC, an estimate of the reference's
single-GPU rate (~2 iters/s for this config on the era's hardware); the
BASELINE.md target is >=3x that.

The headline `value` stays pinned to the PAPER recipe (bs10 — the number
wall-clock projections of run_pascal_aug_experiments.sh:17 need), but the
same line also carries the measured 8-ALIGNED capability: bs12/chip makes
the step's internal 2xbs image batches a multiple of 8 sublanes, removing
the bs10 recipe's structural padding (measured 107.4 vs 90.1 img/s after the
round-5 one-hot CE fix; the production configuration — see
results_evidence/shape_alignment/ and results_evidence/op_breakdown/).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"value_bs12_aligned", ...}.
"""

import json
import sys
import time


def note(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(metrics):
    """Host round-trip sync that survives `python -O` (no assert)."""
    import numpy as np

    loss = float(metrics["sup_loss"])
    if not np.isfinite(loss):
        raise RuntimeError(f"non-finite sup_loss during bench: {loss}")

REFERENCE_IMG_PER_SEC = 20.0  # estimated reference throughput (see docstring)

BATCH = 10
CROP = 321
NUM_CLASSES = 21
WARMUP = 3
ITERS = 30


def main():
    from cutmix_seg_tpu.utils.device_probe import probe_devices

    # fail fast when the TPU tunnel is dead instead of hanging on
    # jax.devices() (observed: multi-hour outages)
    n_dev, diag = probe_devices()
    if n_dev < 1:
        note("bench: device backend unreachable (TPU tunnel down, or "
             f"another process holds the chip?) — aborting: {diag}")
        sys.exit(3)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cutmix_seg_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    cache_dir = enable_persistent_compilation_cache()
    note(f"bench: persistent compilation cache at {cache_dir}")

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
        num_classes=NUM_CLASSES, dtype=jnp.bfloat16, pretrained=False
    )
    total_iters = 40_000
    opt_cfg = OptimizerConfig(
        opt_type="adam",
        learning_rate=3e-5,
        lr_schedule=make_lr_schedule("none", 3e-5, total_iters),
    )
    note("bench: creating train state...")
    state, tx = create_train_state(
        # init at a small spatial size: parameter shapes are spatial-size
        # independent and the full-size init program is slow to compile
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(65, 65),
        mean_teacher=True, pretrained=False,
    )
    cfg = MaskConsistencyConfig(
        mask_mode="mix",
        box=BoxMaskConfig((0.5, 0.5)),
        cons_weight=1.0,
        conf_thresh=0.97,
        conf_per_pixel=False,
        freeze_bn=True,
        mean_teacher=True,
        teacher_alpha=0.99,
        # jnp rasterise+blend: measured equal to the Pallas kernel inside the
        # full step (convs dominate) and ~70s cheaper to compile through the
        # remote-compile tunnel
        pallas_cutmix="off",
        # bit-exact backward remat of the softmax loss chains: measured
        # ~0.5% step-time win + lower peak memory, zero parity risk
        # (results_evidence/loss_chain/probe.json)
        remat_loss_chain=True,
        # loss-side softmax chains in bf16 (pixel sums stay f32): measured
        # 126.9 -> 125.0 ms/step (+1.5%) at this recipe; parity basis =
        # zero bf16-vs-f32 conf-gate flips over 10.3M pixels at a converged
        # teacher at both 0.8 and 0.97 thresholds
        # (results_evidence/loss_chain/probe.json,
        #  results_evidence/voc_matched_pair/summary.json)
        loss_softmax_dtype="bfloat16",
    )

    if jax.process_count() > 1:
        note("bench sizes the batch by len(jax.devices()); multi-process "
             "runs would inflate the global batch — run single-process.")
        sys.exit(3)
    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    step = jit_sharded_step(make_mask_mt_step(model, tx, cfg), mesh)

    def time_batch_size(state, bs):
        rng = np.random.RandomState(0)
        b = bs * n_chips
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
        batch = shard_batch(mesh,
                            {k: jnp.asarray(v) for k, v in batch.items()})
        ramp = jnp.float32(1.0)

        note(f"bench: bs{bs} warmup/compile...")
        t_w = time.perf_counter()
        for _ in range(WARMUP):
            state, metrics = step(state, batch, ramp)
            # force a host round-trip: on the experimental axon platform
            # block_until_ready does not reliably synchronise; syncing each
            # warmup step also absorbs the layout recompile before timing
            sync(metrics)
        note(f"bench: bs{bs} warmup done in "
             f"{time.perf_counter() - t_w:.1f}s; timing...")

        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = step(state, batch, ramp)
        sync(metrics)
        dt = time.perf_counter() - t0
        return state, (ITERS / dt) * bs  # images/sec/chip at bs/chip

    # headline: the paper recipe (bs10); capability: the 8-aligned bs12
    # production shape (2*12 images = 24 sublanes, zero padding)
    state, img_per_sec_bs10 = time_batch_size(state, BATCH)
    state, img_per_sec_bs12 = time_batch_size(state, 12)
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip (CutMix mean-teacher, DeepLab v2 R101, bs10, 321^2)",
                "value": round(img_per_sec_bs10, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec_bs10 / REFERENCE_IMG_PER_SEC, 3),
                # the denominator is an ESTIMATE of the reference's GPU-era
                # rate (no GPU exists here); the measured anchor is the
                # same-host torch-CPU reference timing in
                # results_evidence/reference_baseline/baseline.json
                "vs_baseline_basis": (
                    f"estimated reference GPU throughput "
                    f"{REFERENCE_IMG_PER_SEC} img/s; measured torch-CPU "
                    "reference anchor in results_evidence/reference_baseline"
                ),
                # same step, 8-aligned per-chip batch (the production shape;
                # the paper recipe's bs10 pads its internal 2xbs=20 image
                # batches to 24 sublanes — results_evidence/shape_alignment/)
                "value_bs12_aligned": round(img_per_sec_bs12, 3),
                "vs_baseline_bs12_aligned": round(
                    img_per_sec_bs12 / REFERENCE_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
