"""VOC matched-budget pair + paper-gate arm + converged-teacher bf16 probe.

Round-3 VERDICT item 6: the committed VOC headline pair compared a 96-epoch
semisup extension against an 80-epoch supervised final, and every committed
positive ran a 0.8 confidence gate. This driver produces the clean set on
the real chip, all arms at the SAME horizon from identical seeds/streams
(scripts/tpu_e2e_voc.py synthetic loose-file task, DeepLab v2 R101, crop
321^2, bs 10, CutMix mean-teacher; reference recipe
run_pascal_aug_experiments.sh:14-31):

  supervised96   cons_weight 0, 96 epochs x 40 iters
  semisup96      cons_weight 1, conf 0.8 (the round-3 recipe), matched budget
  semisup97      cons_weight 1, conf 0.97 — the PAPER's gate
                 (run_pascal_aug_experiments.sh:22) — with live per-epoch
                 conf rates in its metrics

then measures the bf16 confidence-gate flip fraction AT THE CONVERGED
TEACHER: restores semisup97's final checkpoint and counts pixels whose
(max_prob >= 0.97) gate differs between the f32 and bf16 teacher-logit
chains on real augmented unsupervised batches — replacing the round-3
measurement taken on a 150-step teacher whose report disowned it
(results_evidence/loss_chain/report.md).

    python scripts/voc_matched_pair.py --out /tmp/voc_pair_r4
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

EPOCHS = 96
ITERS = 40


def run_arm(out, desc, extra):
    cmd = [sys.executable, os.path.join(HERE, "tpu_e2e_voc.py"),
           "--epochs", str(EPOCHS), "--iters", str(ITERS),
           "--n_train", "40", "--n_sup", "6", "--lr", "1e-4",
           "--rampup", "12", "--job_desc", desc, "--out", out,
           "--checkpoint_interval", "32"] + extra
    print("run:", " ".join(cmd), flush=True)
    log = open(os.path.join(out, f"driver_{desc}.log"), "w")
    t0 = time.time()
    rc = subprocess.call(cmd, stdout=log, stderr=subprocess.STDOUT, cwd=REPO)
    print(f"{desc}: rc={rc} in {time.time() - t0:.0f}s", flush=True)
    if rc != 0:
        raise SystemExit(f"arm {desc} failed rc={rc}")


def read_metrics(out, desc):
    path = os.path.join(out, "results", "tpu_e2e_voc", desc,
                        f"metrics_{desc}.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def final_per_class(out, desc):
    """Last per-class IoU line from the run log ('-- a%, b%, ...')."""
    path = os.path.join(out, "results", "tpu_e2e_voc", desc,
                        f"log_{desc}.txt")
    last = None
    with open(path) as f:
        for line in f:
            if line.startswith("-- "):
                last = line.strip()[3:]
    return [float(x.rstrip("%")) for x in last.split(", ")] if last else None


def gate_flip_probe(out, desc, n_batches=10):
    """Converged-teacher bf16 gate analysis on real augmented unsup crops."""
    import numpy as np

    from tpu_e2e_voc import make_voc_tree  # noqa: F401  (tree exists)

    import jax
    import jax.numpy as jnp

    from cutmix_seg_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    from cutmix_seg_tpu.aug.params import GeomConfig
    from cutmix_seg_tpu.core import checkpoint as ckpt
    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        OptimizerConfig,
        create_train_state,
    )
    from cutmix_seg_tpu.data import datasets, sources
    from cutmix_seg_tpu.data.loader import HostBatchBuilder
    from cutmix_seg_tpu.models.deeplab2 import resnet101_deeplab_imagenet
    from cutmix_seg_tpu.semisup.stepcore import apply_model
    from cutmix_seg_tpu.train import common

    root = os.path.join(out, "VOC2012")
    orig = sources.PascalVOCDataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, augmented=False,
                fg_class_subset=None, root_arg=None):
        orig(self, n_val, val_rng, trainval_perm, False, fg_class_subset,
             root_arg or root)

    sources.PascalVOCDataSource.__init__ = patched
    dd = datasets.load_dataset("pascal", -1, 131, 6, -1, 12345, None)
    ds = dd["ds_src"]

    model = resnet101_deeplab_imagenet(num_classes=21, dtype=jnp.bfloat16,
                                       pretrained=False)
    opt_cfg = OptimizerConfig(opt_type="adam", learning_rate=1e-4,
                              lr_schedule=make_lr_schedule("none", 1e-4, 100))
    state, _ = create_train_state(model, opt_cfg, jax.random.PRNGKey(0),
                                  input_hw=(65, 65), mean_teacher=True,
                                  pretrained=False)
    ckpt_dir = os.path.join(out, "results", "tpu_e2e_voc", desc,
                            "checkpoints")
    latest = ckpt.latest_checkpoint(ckpt_dir)
    if latest is None:
        raise SystemExit(f"no checkpoint under {ckpt_dir}")
    state = ckpt.restore_checkpoint(latest, state)
    print(f"gate probe: restored {latest} at step {int(state.step)}",
          flush=True)

    geom = GeomConfig.from_cli((321, 321), True, 1.0, 0.0, False, True,
                               False, False)
    mean, std = common.resolve_mean_std(model, ds)
    aug = common.DeviceAugmentor(mean, std, (321, 321), geom.mode,
                                 colour=None,
                                 separable=common.separable_for_geom(geom))
    builder = HostBatchBuilder(ds, geom, with_labels=False, n_threads=2)

    def gate_stats(params, batch_stats, host):
        u = aug.unsup(host, None)
        logits, _ = apply_model(model, params, batch_stats, u["image"],
                                train=False, freeze_bn=True)
        conf32 = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).max(-1)
        conf16 = jax.nn.softmax(
            logits.astype(jnp.bfloat16).astype(jnp.float32), axis=-1).max(-1)
        out = {}
        for th in (0.97, 0.8):
            g32 = conf32 >= th
            g16 = conf16 >= th
            out[f"flip_{th}"] = (g32 != g16).mean()
            out[f"rate_{th}"] = g32.mean()
        out["mean_max_prob"] = conf32.mean()
        return out

    jfn = jax.jit(gate_stats)
    rng = np.random.RandomState(0)
    acc = {}
    for _ in range(n_batches):
        idx = rng.choice(dd["unsup_ndx"], 10)
        host = builder.build(idx, rng)
        host = {k: jnp.asarray(v) for k, v in host.items()}
        stats = {k: float(np.asarray(v)) for k, v in
                 jfn(state.teacher.params, state.teacher.batch_stats,
                     host).items()}
        for k, v in stats.items():
            acc.setdefault(k, []).append(v)
    return {k: round(float(np.mean(v)), 6) for k, v in acc.items()} | {
        "checkpoint": os.path.basename(latest),
        "checkpoint_step": int(state.step),
        "n_pixels": n_batches * 10 * 321 * 321,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/voc_pair_r4")
    ap.add_argument("--evidence_dir",
                    default=os.path.join(REPO, "results_evidence",
                                         "voc_matched_pair"))
    ap.add_argument("--skip_runs", action="store_true",
                    help="only re-run the analysis/probe over existing runs")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if not args.skip_runs:
        run_arm(args.out, "supervised96", ["--conf_thresh", "0.8",
                                           "--cons_weight", "0"])
        run_arm(args.out, "semisup96", ["--conf_thresh", "0.8"])
        run_arm(args.out, "semisup97", ["--conf_thresh", "0.97"])

    gate = gate_flip_probe(args.out, "semisup97")
    print("gate:", json.dumps(gate), flush=True)

    summary = {"arms": {}, "gate_probe_semisup97": gate,
               "protocol": f"{EPOCHS} epochs x {ITERS} iters, matched "
                           "budgets, identical seeds/streams; only "
                           "cons_weight/conf_thresh differ"}
    for desc in ("supervised96", "semisup96", "semisup97"):
        recs = read_metrics(args.out, desc)
        summary["arms"][desc] = {
            "final_val_miou": recs[-1]["val_miou"],
            "trajectory_16s": [round(r["val_miou"], 4) for r in recs
                               if r["epoch"] % 16 == 0],
            "final_conf_rate": recs[-1]["conf_rate"],
            "per_class_final": final_per_class(args.out, desc),
        }
    d96 = (summary["arms"]["semisup96"]["final_val_miou"]
           - summary["arms"]["supervised96"]["final_val_miou"])
    d97 = (summary["arms"]["semisup97"]["final_val_miou"]
           - summary["arms"]["supervised96"]["final_val_miou"])
    summary["matched_horizon_delta_conf08"] = round(d96, 4)
    summary["matched_horizon_delta_conf097"] = round(d97, 4)

    os.makedirs(args.evidence_dir, exist_ok=True)
    with open(os.path.join(args.evidence_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    for desc in ("supervised96", "semisup96", "semisup97"):
        shutil.copy(
            os.path.join(args.out, "results", "tpu_e2e_voc", desc,
                         f"metrics_{desc}.jsonl"),
            os.path.join(args.evidence_dir, f"metrics_{desc}.jsonl"))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
