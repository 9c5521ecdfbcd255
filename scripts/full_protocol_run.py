"""Full-length protocol endurance run: 40 epochs x 1000 iters + mid-run
SIGTERM + --resume, with a bit-exact continuation check at protocol scale.

The reference's unit of work is 40 epochs x 1000 iterations
(reference: run_pascal_aug_experiments.sh:17). This driver runs the
synthetic-VOC headline recipe (scripts/tpu_e2e_voc.py — loose-file data
path, DeepLab v2 R101, crop 321^2, bs 10, CutMix mean-teacher) at that full
protocol length on the chip, and exercises preemption/resume FOR REAL in
the middle of it:

  phase A  launch the 40x1000 run; once epoch INTERRUPT_AFTER's metrics
           line lands, wait into the following epoch and deliver SIGTERM.
           The engine stops before the next dispatch (mid-epoch state is
           never saved) — the latest epoch-boundary checkpoint becomes the
           resume point.
  phase B  relaunch with --resume. The engine restores the checkpoint and
           REPLAYS the epochs after it deterministically (epoch-folded
           streams; train/engine.py::_open_epoch_streams).

Because phase A already logged the replayed epochs before the signal
landed, those epochs appear TWICE in the metrics JSONL — once from each
process. Asserting the two records bit-equal (sup/cons loss, conf rate,
val mIoU) proves bit-exact resume at protocol scale with zero extra
compute. The driver also checks epoch-time stability across the full run
(no leak/drift) and writes the artifact set to
results_evidence/full_protocol/.

    python scripts/full_protocol_run.py --out /tmp/full_protocol
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

METRIC_KEYS = ("sup_loss", "cons_loss", "conf_rate", "val_miou")


def read_metrics(path):
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def launch(args, resume):
    cmd = [
        sys.executable, os.path.join(HERE, "tpu_e2e_voc.py"),
        "--epochs", str(args.epochs), "--iters", str(args.iters),
        "--n_train", "40", "--n_sup", "6", "--lr", "1e-4",
        "--conf_thresh", "0.8", "--rampup", str(args.rampup),
        "--checkpoint_interval", str(args.checkpoint_interval),
        "--job_desc", args.job_desc, "--out", args.out,
    ]
    if resume:
        cmd.append("--resume")
    print(f"launch: {' '.join(cmd)}", flush=True)
    log = open(os.path.join(args.out, f"driver_{'B' if resume else 'A'}.log"),
               "w")
    return subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                            cwd=REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/full_protocol")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--rampup", type=int, default=12)
    ap.add_argument("--checkpoint_interval", type=int, default=5)
    ap.add_argument("--interrupt_after", type=int, default=22,
                    help="deliver SIGTERM once this epoch's metrics line "
                         "has landed (i.e. during the following epoch)")
    ap.add_argument("--grace_s", type=float, default=45.0,
                    help="seconds into the following epoch before SIGTERM")
    ap.add_argument("--job_desc", default="full40")
    ap.add_argument("--evidence_dir",
                    default=os.path.join(REPO, "results_evidence",
                                         "full_protocol"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    metrics_path = os.path.join(
        args.out, "results", "tpu_e2e_voc", args.job_desc,
        f"metrics_{args.job_desc}.jsonl")

    # ---- phase A: run, then SIGTERM mid-epoch ----
    t_a0 = time.time()
    proc = launch(args, resume=False)
    interrupted = False
    while proc.poll() is None:
        time.sleep(10)
        recs = read_metrics(metrics_path)
        if recs and recs[-1]["epoch"] >= args.interrupt_after:
            print(f"epoch {recs[-1]['epoch']} logged; waiting {args.grace_s}s "
                  "into the next epoch, then SIGTERM", flush=True)
            time.sleep(args.grace_s)
            proc.send_signal(signal.SIGTERM)
            interrupted = True
            break
    rc_a = proc.wait()
    t_a = time.time() - t_a0
    print(f"phase A exit rc={rc_a} after {t_a:.0f}s "
          f"(interrupted={interrupted})", flush=True)
    if not interrupted:
        raise SystemExit("phase A finished before the interrupt point — "
                         "raise --interrupt_after?")
    a_recs = read_metrics(metrics_path)
    a_last = a_recs[-1]["epoch"]

    # ---- phase B: resume to completion ----
    t_b0 = time.time()
    proc = launch(args, resume=True)
    rc_b = proc.wait()
    t_b = time.time() - t_b0
    print(f"phase B exit rc={rc_b} after {t_b:.0f}s", flush=True)
    if rc_b != 0:
        raise SystemExit(f"resume phase failed rc={rc_b}")

    # ---- analysis ----
    recs = read_metrics(metrics_path)
    by_epoch = {}
    for r in recs:
        by_epoch.setdefault(r["epoch"], []).append(r)
    overlap = sorted(e for e, v in by_epoch.items() if len(v) >= 2)
    if not overlap:
        raise SystemExit(
            "no overlap epochs — the interrupt landed on a checkpoint "
            "boundary; nothing was replayed (rerun with different "
            "--interrupt_after for the bit-exact evidence)")
    mismatches = []
    for e in overlap:
        first, second = by_epoch[e][0], by_epoch[e][1]
        for k in METRIC_KEYS:
            if first[k] != second[k]:
                mismatches.append((e, k, first[k], second[k]))
    epochs_done = sorted(by_epoch)
    assert epochs_done == list(range(1, args.epochs + 1)), epochs_done

    # epoch-time stability: phase-B steady epochs, first half vs second half
    # (epoch 1 of each process carries the compile)
    b_times = [by_epoch[e][-1]["epoch_time"] for e in
               range(a_last + 2, args.epochs + 1)]
    a_times = [by_epoch[e][0]["epoch_time"] for e in range(2, a_last + 1)]
    steady = a_times + b_times
    import statistics

    half = len(steady) // 2
    drift = (statistics.mean(steady[half:]) / statistics.mean(steady[:half])
             - 1.0)
    summary = {
        "protocol": f"{args.epochs} epochs x {args.iters} iters, bs 10, "
                    "crop 321^2, DeepLab v2 R101, CutMix mean-teacher "
                    "(reference: run_pascal_aug_experiments.sh:17)",
        "phase_a_epochs": a_last,
        "phase_a_wall_s": round(t_a, 1),
        "phase_b_wall_s": round(t_b, 1),
        "overlap_epochs": overlap,
        "overlap_bit_exact": not mismatches,
        "overlap_mismatches": mismatches,
        "steady_epoch_time_mean_s": round(statistics.mean(steady), 2),
        "steady_epoch_time_stdev_s": round(statistics.pstdev(steady), 2),
        "steady_epoch_time_min_s": round(min(steady), 2),
        "steady_epoch_time_max_s": round(max(steady), 2),
        "second_half_vs_first_half_drift": round(drift, 4),
        "final_val_miou": by_epoch[args.epochs][-1]["val_miou"],
        "final_cons_loss": by_epoch[args.epochs][-1]["cons_loss"],
        "images_per_sec_steady": round(
            args.iters * 10 / statistics.mean(steady), 1),
    }
    os.makedirs(args.evidence_dir, exist_ok=True)
    with open(os.path.join(args.evidence_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    import shutil

    shutil.copy(metrics_path,
                os.path.join(args.evidence_dir,
                             f"metrics_{args.job_desc}.jsonl"))
    for tag in ("A", "B"):
        src = os.path.join(args.out, f"driver_{tag}.log")
        dst = os.path.join(args.evidence_dir, f"log_phase_{tag}.txt")
        # keep the logs reviewable: head + tail if enormous
        with open(src) as f:
            lines = f.readlines()
        if len(lines) > 400:
            lines = lines[:200] + ["... [truncated] ...\n"] + lines[-200:]
        with open(dst, "w") as f:
            f.writelines(lines)
    print(json.dumps(summary, indent=2))
    if mismatches:
        raise SystemExit(f"OVERLAP MISMATCH: {mismatches[:5]}")
    print("full protocol run complete; artifacts in", args.evidence_dir)


if __name__ == "__main__":
    main()
