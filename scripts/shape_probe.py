"""Shape-alignment probe: measured cost of the paper recipe's odd shapes.

The round-2 MFU forensics identified the mask_mt step's structural padding
costs on TPU: the step's internal 2*bs-image batches pad 20 -> 24 sublanes
(+20%) at the paper's bs=10, and the 321^2 crop's OS8 feature maps (41^2)
pad 41 -> 48 (+17%) on every dilated layer3/4 conv. This probe times the
SAME fused step (DeepLab v2 R101, frozen BN, mask mix — the headline recipe,
reference: run_pascal_aug_experiments.sh:14-31) across (batch, crop) variants
in one process so the padding analysis becomes a measured recipe table:

  bs10 crop321   the paper recipe (the honest bench configuration)
  bs12 crop321   sublane-aligned internal batches (2*12 = 24)
  bs10 crop320   OS8 feature map 40^2 (8-aligned spatial dims)
  bs12 crop320   both alignments
  bs16 crop321   wider sublane-aligned point (2*16 = 32)

crop320 keeps the model contract (BLOCK_SIZE 8 divides 320) but is NOT the
paper recipe: 321 = 320 + 1 exists for align_corners=True grid geometry
(reference crop, run_pascal_aug_experiments.sh:17). The probe quantifies
what that +1 pixel costs on TPU tiling; production deployments free to pick
their crop can read the table directly.

Timing discipline per the repo's measured axon pitfalls: host round-trip on
a scalar for sync, two warmup calls before timing, step-level numbers only.

    python scripts/shape_probe.py --out results_evidence/shape_alignment
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CLASSES = 21
WARMUP = 3  # match bench.py so the bs10/crop321 row is comparable
ITERS = 15


def _sync(metrics):
    """Host round-trip sync that survives `python -O` (no assert)."""
    import numpy as np

    loss = float(metrics["sup_loss"])
    if not np.isfinite(loss):
        raise RuntimeError(f"non-finite sup_loss during probe: {loss}")

VARIANTS = [
    (10, 321),  # paper recipe (bench honesty point)
    (12, 321),  # sublane-aligned internal batches
    (10, 320),  # 8-aligned OS8 spatial dims
    (12, 320),  # both
    (16, 321),  # wider aligned point
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_evidence/shape_alignment")
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

    cfg = MaskConsistencyConfig(
        mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)), cons_weight=1.0,
        conf_thresh=0.97, conf_per_pixel=False, freeze_bn=True,
        mean_teacher=True, teacher_alpha=0.99, pallas_cutmix="off",
        remat_loss_chain=True)  # match bench.py's honest recipe

    if jax.process_count() > 1:
        raise SystemExit(
            "shape_probe sizes the batch by len(jax.devices()); in a "
            "multi-process run that inflates the global batch — run it "
            "single-process.")
    n_chips = len(jax.devices())
    mesh = make_mesh(n_chips)
    step = jit_sharded_step(make_mask_mt_step(model, tx, cfg), mesh)

    rng = np.random.RandomState(0)
    results = {}
    for bs, crop in VARIANTS:
        b = bs * n_chips
        batch = {
            "sup_x": rng.randn(b, crop, crop, 3).astype(np.float32),
            "sup_y": rng.randint(
                0, NUM_CLASSES, size=(b, crop, crop)).astype(np.int32),
            "um0": np.ones((b, crop, crop, 1), np.float32),
            "um1": np.ones((b, crop, crop, 1), np.float32),
        }
        for k in ("ux0", "ux1"):
            x = rng.randn(b, crop, crop, 3).astype(np.float32)
            batch[f"{k}_tea"] = x
            batch[f"{k}_stu"] = x
        batch = shard_batch(
            mesh, {k: jnp.asarray(v) for k, v in batch.items()})
        ramp = jnp.float32(1.0)

        t_c = time.perf_counter()
        for _ in range(WARMUP):
            state, metrics = step(state, batch, ramp)
            _sync(metrics)
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = step(state, batch, ramp)
        _sync(metrics)
        dt = time.perf_counter() - t0
        key = f"bs{bs}_crop{crop}"
        step_ms = dt / ITERS * 1000.0
        results[key] = {
            "batch_per_chip": bs,
            "crop": crop,
            "step_ms": round(step_ms, 2),
            "img_per_sec_per_chip": round(ITERS / dt * bs, 2),
            # per-pixel rate normalises away both batch and crop so the
            # variants compare as pure tiling efficiency
            "megapixel_per_sec_per_chip": round(
                bs * crop * crop / step_ms / 1000.0, 1),
            "warmup_s": round(compile_s, 1),
        }
        print(f"{key}: {results[key]}", file=sys.stderr, flush=True)

    os.makedirs(args.out, exist_ok=True)
    out = {
        "recipe": "mask_mt DeepLab v2 R101 frozen-BN mix (paper headline "
                  "shape family); one process, shared state/step fn, 3-call "
                  "warmup (matches bench.py), 15 timed iters, scalar "
                  "host-round-trip sync; remat_loss_chain=True as in bench",
        "device": str(jax.devices()[0]),
        "variants": results,
    }
    path = os.path.join(args.out, "probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
