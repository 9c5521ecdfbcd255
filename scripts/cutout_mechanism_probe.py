"""Why Cutout's sign differs by task: measure the signal its loss rides on.

The reference's Cutout branch applies the consistency loss on VISIBLE
pixels only (reference: train_seg_semisup_mask_mt.py:399-401,
``loss_mask = batch_cut_masks * batch_um`` with ``x_cut = x * mask``), so
the gradient is exactly as large as erasing context CHANGES the network's
predictions on the pixels that remain. This probe trains a supervised-only
model per task (the sweep's own runner), then measures, under the paper's
Cutout mask distribution (prop 0.0:1.0, random aspect, invert):

  * visible-pixel argmax disagreement rate between f(x) and f(x*mask)
  * mean per-pixel 'var' consistency loss on visible pixels (the actual
    loss the Cutout trainer would backprop)
  * confidence-gate pass rates at 0.8 and 0.97 on the full image (what
    fraction of that signal each gate lets through)

for the three synthetic tasks of tools/multi_seed_convergence.py. Companion
evidence for results_evidence/cutout_scale_sweep/: the sweep measures the
OUTCOME (mIoU gain) per task; this measures the MECHANISM.

    python scripts/cutout_mechanism_probe.py --out results_evidence/cutout_scale_sweep
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 2000
N_SEEDS = 4
BATCH = 8
N_UNSUP = 256
N_MEASURE = 64  # unsup images per seed used for the measurement


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_evidence/cutout_scale_sweep")
    ap.add_argument("--tasks", default="shapes,large_shapes,context_size")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cutmix_seg_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    import cutmix_seg_tpu.tools.multi_seed_convergence as M
    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import OptimizerConfig
    from cutmix_seg_tpu.masks.box_mask import (
        BoxMaskConfig,
        rasterise_masks,
        sample_box_rects,
    )
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.semisup.mask_mt import (
        MaskConsistencyConfig,
        make_mask_mt_step,
    )
    from cutmix_seg_tpu.semisup.stepcore import apply_model

    seeds = list(range(N_SEEDS))
    model = SegModel(
        name="tiny_deeplab_synth",
        module=DeepLab2(num_classes=M.C, layers=(1, 1, 2, 1)),
        mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
        param_label=_param_label)
    opt_cfg = OptimizerConfig(opt_type="adam", learning_rate=1e-3,
                              lr_schedule=make_lr_schedule("none", 1e-3,
                                                           ITERS))
    sup_cfg = MaskConsistencyConfig(
        mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)), cons_weight=0.0,
        pallas_cutmix="off", conf_thresh=0.8, freeze_bn=True,
        mean_teacher=True, teacher_alpha=0.99)
    box = BoxMaskConfig((0.0, 1.0))  # the paper's Cutout mask distribution
    ramps = jnp.asarray(np.minimum(1.0, np.arange(ITERS) / (ITERS * 0.3)),
                        jnp.float32)

    def measure_one(teacher, x, key):
        """Per-seed: visible-pixel perturbation stats under Cutout masks."""
        rects = sample_box_rects(box, key, x.shape[0], M.HW)
        m = rasterise_masks(rects, M.HW)  # (N, H, W, 1), 1 = visible
        logits_full, _ = apply_model(model, teacher.params,
                                     teacher.batch_stats, x,
                                     train=False, freeze_bn=True)
        logits_cut, _ = apply_model(model, teacher.params,
                                    teacher.batch_stats, x * m,
                                    train=False, freeze_bn=True)
        vis = m[..., 0]
        nvis = jnp.maximum(vis.sum(), 1.0)
        flip = ((jnp.argmax(logits_full, -1) != jnp.argmax(logits_cut, -1))
                * vis).sum() / nvis
        p_full = jax.nn.softmax(logits_full.astype(jnp.float32), -1)
        p_cut = jax.nn.softmax(logits_cut.astype(jnp.float32), -1)
        var_px = ((p_cut - p_full) ** 2).sum(-1)  # the 'var' cons loss
        var_vis = (var_px * vis).sum() / nvis
        conf = p_full.max(-1)
        return (flip, var_vis, (conf >= 0.8).mean(), (conf >= 0.97).mean(),
                vis.mean())

    measure = jax.jit(jax.vmap(measure_one, in_axes=(0, 0, 0)))

    results = {}
    for task in [t.strip() for t in args.tasks.split(",") if t.strip()]:
        M.TASK = task
        t0 = time.time()
        data_np = [M.build_seed_data(s, 6, N_UNSUP, 16, aug_src=False)
                   for s in seeds]
        data = {k: jnp.asarray(np.stack([d[k] for d in data_np]))
                for k in ("sup_x", "sup_y", "unsup_x")}
        stream = {}
        for name, off, hi in (("s", 0, 6), ("u0", 101, N_UNSUP),
                              ("u1", 203, N_UNSUP)):
            arr = np.stack([np.random.RandomState(2000 + s * 1000 + off)
                            .randint(0, hi, size=(ITERS, BATCH))
                            for s in seeds], axis=1)
            stream[name] = jnp.asarray(arr.astype(np.int32))

        state, tx = M.stack_states(model, opt_cfg, seeds)
        runner = M.make_arm_runner(model, tx, sup_cfg, make_mask_mt_step,
                                   "mask_mt", 6, N_UNSUP, BATCH)
        for c0 in range(0, ITERS, 500):
            sl = slice(c0, c0 + 500)
            xs_c = {k: v[sl] for k, v in stream.items()}
            state, losses = runner(state, data, xs_c, ramps[sl])
        final_loss = float(np.asarray(losses)[-1].mean())

        keys = jax.random.split(jax.random.PRNGKey(7), N_SEEDS)
        flip, var_vis, g80, g97, vis_frac = measure(
            state.teacher, data["unsup_x"][:, :N_MEASURE], keys)
        results[task] = {
            "visible_argmax_flip_rate": [round(float(v), 4) for v in flip],
            "visible_var_loss": [round(float(v), 5) for v in var_vis],
            "gate_rate_0.8": [round(float(v), 3) for v in g80],
            "gate_rate_0.97": [round(float(v), 3) for v in g97],
            "visible_fraction_mean": round(float(np.mean(vis_frac)), 3),
            "final_sup_loss_mean": round(final_loss, 4),
            "seconds": round(time.time() - t0, 1),
        }
        print(task, json.dumps(results[task]), flush=True)

    out_doc = {
        "protocol": f"{N_SEEDS} seeds x {ITERS} supervised iters per task "
                    f"(the sweep's own runner, cons_weight=0); measurement "
                    f"on {N_MEASURE} unsup images/seed under Cutout masks "
                    "prop 0.0:1.0 (reference: "
                    "run_pascal_aug_experiments.sh:21 REG_MASK_CUTOUT); "
                    "visible pixels = the reference cut branch's loss "
                    "region (train_seg_semisup_mask_mt.py:399-401)",
        "hw": list(M.HW),
        "tasks": results,
        "device": str(jax.devices()[0]),
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "mechanism_probe.json")
    with open(path, "w") as f:
        json.dump(out_doc, f, indent=2)
    print(json.dumps(out_doc))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
