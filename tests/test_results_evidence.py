"""The committed convergence-evidence artifacts must exist and parse.

Round-2 evidence: full-length toy2d Figure-3 recipe runs (and, when present,
the long synthetic segmentation convergence pair) are committed under
results_evidence/; this guards the files against bit-rot and asserts the
semantics they claim (error rates parse, metrics JSONL well-formed,
renders are PNGs).
"""

import json
import os
import re

import pytest

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results_evidence")

TOY2D_RUNS = ["cluster_semisup_run1", "cluster_sup_run1",
              "continuous_semisup_run1"]


@pytest.mark.parametrize("run", TOY2D_RUNS)
def test_toy2d_artifacts_parse(run):
    d = os.path.join(ROOT, "toy2d", run)
    logs = [f for f in os.listdir(d) if f.startswith("log_")]
    assert len(logs) == 1
    text = open(os.path.join(d, logs[0])).read()
    m = re.search(r"FINAL RESULT: Error rate=([\d.]+)%", text)
    assert m, "final error rate line missing"
    assert 0.0 < float(m.group(1)) < 50.0

    metrics = [f for f in os.listdir(d) if f.startswith("metrics_")]
    assert len(metrics) == 1
    lines = open(os.path.join(d, metrics[0])).read().splitlines()
    assert lines
    epochs = [json.loads(ln) for ln in lines]
    assert all("sup_loss" in e and "epoch" in e for e in epochs)
    expected_epochs = 25 if run == "cluster_sup_run1" else 100
    assert epochs[-1]["epoch"] == expected_epochs

    png = os.path.join(d, "final_render.png")
    with open(png, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_toy2d_report_consistent_with_logs():
    report = open(os.path.join(ROOT, "toy2d", "report.md")).read()
    for run in TOY2D_RUNS:
        d = os.path.join(ROOT, "toy2d", run)
        logs = [f for f in os.listdir(d) if f.startswith("log_")][0]
        m = re.search(r"FINAL RESULT: Error rate=([\d.]+)%",
                      open(os.path.join(d, logs)).read())
        assert f"{float(m.group(1)):.3f}%" in report, (run, m.group(1))


def test_cityscapes_scale_pair_parses():
    d = os.path.join(ROOT, "cityscapes_scale")
    mious = {}
    for run in ("semisup", "supervised"):
        text = open(os.path.join(d, f"log_{run}.txt")).read()
        vals = re.findall(r"VAL mIoU=([\d.]+)%", text)
        assert len(vals) == 15, run
        mious[run] = float(vals[-1])
        lines = open(os.path.join(d, f"metrics_{run}.jsonl")).read().splitlines()
        assert json.loads(lines[-1])["epoch"] == 15
    # the task saturates (see report.md); consistency must not hurt
    assert abs(mious["semisup"] - mious["supervised"]) < 0.5
    report = open(os.path.join(d, "report.md")).read()
    assert f"{mious['semisup']:.3f}%" in report


def test_voc_scale_pair_parses_and_separates():
    """Round-3 VOC warm-start pair (VERDICT item 6): identical 80-epoch
    headline-shape arms differing only in cons_weight; the rampup-
    warm-started semisup arm must beat the supervised arm clearly."""
    d = os.path.join(ROOT, "voc_scale")
    mious, clf1 = {}, {}
    for run in ("semisup80", "supervised80"):
        text = open(os.path.join(d, f"log_{run}.txt")).read()
        vals = re.findall(r"VAL mIoU=([\d.]+)%", text)
        assert len(vals) == 80, run
        mious[run] = [float(v) for v in vals]
        clf1[run] = re.search(r"Epoch 1: .*clf loss=([\d.]+)", text).group(1)
        lines = open(os.path.join(d, f"metrics_{run}.jsonl")).read().splitlines()
        assert json.loads(lines[-1])["epoch"] == 80
        # recipe shape: headline flags present in the settings dump
        for flag in ("crop_size=321,321", "batch_size=10", "mask_mode=mix",
                     "aug_scale_hung=True", "aug_strong_colour=True",
                     "rampup="):
            assert flag in text, (run, flag)
    # warm-start determinism: identical supervised phase before the ramp
    assert float(clf1["semisup80"]) == pytest.approx(
        float(clf1["supervised80"]), abs=1e-4)
    # the consistency term must separate the pair at the matched horizon
    # (+0.44 measured at epoch 80) and still be WIDENING at budget end
    assert mious["semisup80"][-1] > mious["supervised80"][-1] + 0.3
    assert (mious["semisup80"][-1] - mious["semisup80"][-8]) > \
        (mious["supervised80"][-1] - mious["supervised80"][-8])
    # the checkpoint-resumed extension confirms the trend with real data:
    # semisup epoch 96 clears the supervised FINAL by > 1 mIoU
    ext = open(os.path.join(d, "log_semisup_ext96_partial.txt")).read()
    ext_vals = [float(v) for v in re.findall(r"VAL mIoU=([\d.]+)%", ext)]
    assert ext_vals, "extension log must carry epochs past 80"
    assert max(ext_vals) > mious["supervised80"][-1] + 1.0
    report = open(os.path.join(d, "report.md")).read()
    assert f"{mious['semisup80'][-1]:.2f}" in report
    assert f"{mious['supervised80'][-1]:.2f}" in report


def test_multi_seed_demo_artifact_parses():
    """The paper's 5-seed protocol in one program: five seeds, per-seed
    independence of BOTH loss terms, and the paper-table aggregate line."""
    d = os.path.join(ROOT, "multi_seed")
    text = open(os.path.join(d, "log_run.txt")).read()
    lines = re.findall(
        r"Epoch (\d+) \[seed (\d+)\]: .*clf loss=([\d.]+), "
        r"consistency loss=([\d.]+).*VAL mIoU=([\d.]+)%",
        text)
    seeds = {s for _, s, _, _, _ in lines}
    assert seeds == {"12345", "23456", "34567", "45678", "56789"}
    # per-seed independence: both loss terms differ across seeds in-epoch,
    # and the consistency term is live (nonzero)
    ep1 = {s: loss for e, s, loss, _, _ in lines if e == "1"}
    assert len(set(ep1.values())) == 5, ep1
    cons1 = {s: c for e, s, _, c, _ in lines if e == "1"}
    assert len(set(cons1.values())) == 5, cons1
    assert all(float(c) > 0 for c in cons1.values()), cons1
    m = re.search(r"SEEDS AGGREGATE \(([\d,]+)\): VAL mIoU "
                  r"mean=([\d.]+)% std=([\d.]+)% n=(\d+)", text)
    assert m and m.group(4) == "5", "missing 5-seed aggregate line"
    # structured aggregate record mirrors the log line
    rec = json.loads(open(os.path.join(
        d, "metrics_run.jsonl")).read().splitlines()[-1])
    assert len(rec["final_seed_mious"]) == 5
    assert abs(rec["final_miou_mean"] * 100 - float(m.group(2))) < 5e-3
    assert abs(rec["final_miou_std"] * 100 - float(m.group(3))) < 5e-3


def test_synthetic_convergence_artifact_parses():
    path = os.path.join(ROOT, "synthetic_seg_convergence.json")
    if not os.path.exists(path):
        pytest.skip("synthetic convergence artifact not committed yet")
    rec = json.loads(open(path).read().strip().splitlines()[-1])
    assert rec["cutmix_semisup_miou"] > rec["supervised_miou"], rec
    assert rec["iters"] >= 4000


def test_algo_convergence_artifacts_parse():
    """The all-four-algorithm convergence evidence must reproduce the
    reference paper's qualitative ordering on every committed seed: CutMix
    clearly positive and the best algorithm, aug_mt NEGATIVE and the worst
    (the paper's motivating failure case), the classic baselines (VAT/ICT)
    strictly between those two. VAT-vs-ICT relative order is NOT asserted:
    it flips between seeds here exactly as it flips between datasets in the
    paper's own tables (VAT above the supervised baseline on VOC, below it
    on Cityscapes)."""
    d = os.path.join(ROOT, "algo_convergence")
    seeds = [f for f in os.listdir(d)
             if f.startswith("seed") and f.endswith(".json")]
    assert len(seeds) >= 2, "need at least two committed algo-convergence seeds"
    report = open(os.path.join(d, "report.md")).read()
    for fn in seeds:
        rec = json.loads(open(os.path.join(d, fn)).read().strip())
        sup = rec["supervised_miou"]
        assert rec["iters"] >= 4000
        assert rec["mask_mt_gain"] > 0.02, rec
        assert rec["mask_mt_semisup_miou"] > sup
        for classic in ("vat_mt", "ict"):
            assert rec["mask_mt_gain"] > rec[f"{classic}_gain"], rec
            assert rec[f"{classic}_gain"] > rec["aug_mt_gain"], rec
        assert rec["aug_mt_gain"] < 0.0, rec
        # report quotes the headline mask_mt number of every seed
        assert f"{rec['mask_mt_semisup_miou'] * 100:.2f}" in report, fn


def test_algo_convergence_multiseed_parses():
    """Round-4 8-seed sweep (VERDICT items 5+7): the paper ordering must
    hold without sign ambiguity — CutMix positive on EVERY seed and the best
    arm everywhere, aug_mt (full Hung pair geometry) negative on EVERY seed,
    VAT/ICT small-positive in between, Cutout present as a first-class row."""
    d = os.path.join(ROOT, "algo_convergence_multiseed")
    rec = json.load(open(os.path.join(d, "results.json")))
    assert rec["n_seeds"] >= 5 and rec["iters"] >= 4000
    arms = rec["arms"]
    for arm in ("supervised", "mask_mt", "cutout", "ict", "vat_mt",
                "aug_mt"):
        assert len(arms[arm]["miou_per_seed"]) == rec["n_seeds"], arm
    # CutMix: positive on every seed, best mean gain, > 1 std from zero
    mm = arms["mask_mt"]
    assert all(g > 0 for g in mm["gain_per_seed"]), mm
    assert mm["gain_mean"] > mm["gain_std"] > 0
    for other in ("cutout", "ict", "vat_mt", "aug_mt"):
        assert mm["gain_mean"] > arms[other]["gain_mean"], other
    # aug_mt: the paper's failure case — negative on every seed
    am = arms["aug_mt"]
    assert all(g < 0 for g in am["gain_per_seed"]), am
    assert am["gain_mean"] < -am["gain_std"] < 0
    # classics strictly between CutMix and aug_mt, sign-stable majorities
    for classic in ("ict", "vat_mt"):
        c = arms[classic]
        assert am["gain_mean"] < c["gain_mean"] < mm["gain_mean"]
        assert sum(g > 0 for g in c["gain_per_seed"]) > rec["n_seeds"] / 2
    # report quotes the headline gains
    report = open(os.path.join(d, "report.md")).read()
    assert f"{mm['gain_mean']:+.3f}" in report
    assert "8/8" in report and "0/8" in report


def test_loss_chain_probe_artifact_parses():
    """The loss-chain probe artifact records the measured falsification of
    the round-2 '>10 ms f32 chain' hypothesis: every variant within ~2% of
    baseline, all at the honest bs10 recipe."""
    rec = json.load(open(os.path.join(ROOT, "loss_chain", "probe.json")))
    base = rec["variants"]["baseline"]["step_ms"]
    assert base > 50  # real-chip step, not a stub
    for name, v in rec["variants"].items():
        assert abs(v["step_ms"] - base) / base < 0.05, (name, v)
        assert v["img_per_sec_per_chip"] > 0
    assert "bf16_gate_analysis" in rec


def test_serving_bench_artifact_parses():
    """Flagship serving curve: device-resident-input headline numbers must
    be monotone non-decreasing in throughput (the round-2 batch-8 'dip'
    was tunnel host->device input transfer — serving/report.md)."""
    path = os.path.join(ROOT, "serving", "serve_bench_321.json")
    rec = json.load(open(path))
    assert rec["platform"] == "tpu" and rec["hw"] == [321, 321]
    curve = [(int(b), r) for b, r in rec["batches"].items()]
    for _, r in curve:
        assert r["images_per_sec"] > 0 and r["latency_ms"] > 0
        # the tunnel-transfer diagnostic is slower than the device path
        assert r["tunnel_host_input_latency_ms"] >= r["latency_ms"]
    curve.sort()
    rates = [r["images_per_sec"] for _, r in curve]
    assert rates == sorted(rates), rates
    # single-image serving latency stays interactive on one chip
    assert rec["batches"]["1"]["latency_ms"] < 20


@pytest.mark.parametrize("run", ["semisup", "supervised"])
def test_isic_scale_artifacts_parse(run):
    d = os.path.join(ROOT, "isic_scale")
    text = open(os.path.join(d, f"log_{run}.txt")).read()
    mious = re.findall(r"VAL mIoU=([\d.]+)%", text)
    assert len(mious) == 3, "expected 3 epochs"
    assert float(mious[-1]) > 90.0
    lines = open(os.path.join(d, f"metrics_{run}.jsonl")).read().splitlines()
    epochs = [json.loads(ln) for ln in lines]
    assert epochs[-1]["epoch"] == 3
    if run == "semisup":
        assert epochs[-1]["cons_loss"] > 0
    else:
        assert epochs[-1]["cons_loss"] == 0
    # steady-state epochs (post-compile) at real resolution on hardware
    assert epochs[-1]["epoch_time"] < 60.0


def test_isic_scale_semisup_gain():
    d = os.path.join(ROOT, "isic_scale")
    final = {}
    for run in ("semisup", "supervised"):
        text = open(os.path.join(d, f"log_{run}.txt")).read()
        final[run] = float(re.findall(r"VAL mIoU=([\d.]+)%", text)[-1])
    assert final["semisup"] > final["supervised"]


def test_isic_hard_pair_shows_nonsaturated_gain():
    """The hard-task hardware pair: semisup must beat supervised by a clear
    margin with neither run saturated (both < 95%)."""
    d = os.path.join(ROOT, "isic_scale")
    final = {}
    for run in ("hard_semisup", "hard_supervised"):
        text = open(os.path.join(d, f"log_{run}.txt")).read()
        mious = [float(m) for m in re.findall(r"VAL mIoU=([\d.]+)%", text)]
        assert len(mious) == 6, "expected 6 epochs"
        final[run] = mious[-1]
        assert mious[-1] < 95.0, "hard task must not saturate"
    assert final["hard_semisup"] - final["hard_supervised"] > 3.0


def test_full_protocol_artifact_parses():
    """Round-4 endurance evidence: the reference's full unit of work
    (40 epochs x 1000 iters; reference: run_pascal_aug_experiments.sh:17)
    ran on the chip with a REAL mid-run SIGTERM + --resume, and the resumed
    process's recomputed overlap epochs match the interrupted process's
    logged metrics bit-for-bit."""
    d = os.path.join(ROOT, "full_protocol")
    s = json.load(open(os.path.join(d, "summary.json")))
    assert s["overlap_bit_exact"] is True
    assert s["overlap_mismatches"] == []
    assert len(s["overlap_epochs"]) >= 1
    assert s["phase_a_epochs"] < 40  # the SIGTERM really was mid-protocol
    lines = [json.loads(ln) for ln in
             open(os.path.join(d, "metrics_full40.jsonl"))]
    assert lines[-1]["epoch"] == 40
    # the overlap epochs appear twice (phase A tail + phase B recompute)
    epochs = [ln["epoch"] for ln in lines]
    for e in s["overlap_epochs"]:
        assert epochs.count(e) == 2, e
    # epoch-time stability across the protocol: the MEDIAN epoch is flat
    # (one-off tunnel stalls show up as outliers, not drift)
    times = sorted(ln["epoch_time"] for ln in lines)
    median = times[len(times) // 2]
    assert 100.0 < median < 200.0, median
    assert abs(s["second_half_vs_first_half_drift"]) < 0.05 * median
    assert s["images_per_sec_steady"] > 60.0


def test_voc_matched_pair_artifact_parses():
    """Round-4 matched-budget VOC triple: all three arms at 96 epochs from
    identical streams; semisup must beat supervised at BOTH the round-3
    gate (0.8) and the paper's gate (0.97), and the converged-teacher bf16
    gate probe must show zero flips (reference:
    run_pascal_aug_experiments.sh:22,31)."""
    d = os.path.join(ROOT, "voc_matched_pair")
    s = json.load(open(os.path.join(d, "summary.json")))
    arms = s["arms"]
    sup = arms["supervised96"]["final_val_miou"]
    assert arms["semisup96"]["final_val_miou"] > sup + 0.008
    assert arms["semisup97"]["final_val_miou"] > sup + 0.008
    # all arms genuinely ran the matched 96-epoch budget
    for arm in ("supervised96", "semisup96", "semisup97"):
        lines = open(os.path.join(d, f"metrics_{arm}.jsonl")).read()
        recs = [json.loads(ln) for ln in lines.splitlines()]
        assert recs[-1]["epoch"] == 96, arm
        assert abs(recs[-1]["val_miou"]
                   - arms[arm]["final_val_miou"]) < 1e-9, arm
    # live gates: neither saturated open nor shut at the converged teacher
    assert 0.05 < arms["semisup97"]["final_conf_rate"] < 0.95
    probe = s["gate_probe_semisup97"]
    assert probe["n_pixels"] > 1_000_000
    assert probe["mean_max_prob"] > 0.5  # genuinely converged-confident
    assert probe["flip_0.8"] == 0.0 and probe["flip_0.97"] == 0.0
    report = open(os.path.join(d, "report.md")).read()
    assert "+1.18" in report and "0.97" in report


def test_voc_multiseed_artifact_parses():
    """Round-5 error bars on the matched-budget triple (VERDICT item 3):
    n>=3 seeds, per-seed deltas recorded, and the report must RETRACT the
    n=1 headline — the honest finding is that from random init at this
    scale the semisup effect is below seed noise (mean negative, 1/3
    positive), with the mechanism documented."""
    d = os.path.join(ROOT, "voc_matched_pair", "multiseed")
    s = json.load(open(os.path.join(d, "summary.json")))
    assert len(s["seeds"]) >= 3
    for semi in ("semisup96", "semisup97"):
        dl = s["deltas_miou_points"][semi]
        assert dl["n_seeds"] == len(s["seeds"])
        assert len(dl["delta_per_seed"]) == dl["n_seeds"]
        # the committed measurement: NOT sign-stable positive
        assert dl["positive_seeds"] < dl["n_seeds"]
        # mean within ~2 std of zero (below seed noise), and every seed's
        # full metrics file is committed alongside
        assert abs(dl["delta_mean"]) < 2.0 * dl["delta_std"]
    for seed in s["seeds"]:
        if seed == 0:
            continue  # seed 0 = the round-4 run, one directory up
        for arm in ("supervised96", "semisup96", "semisup97"):
            path = os.path.join(d, f"metrics_{arm}_s{seed}.jsonl")
            recs = [json.loads(ln) for ln in open(path)]
            assert recs[-1]["epoch"] == 96, (seed, arm)
    report = open(os.path.join(d, "report.md")).read()
    assert "retract" in report.lower() and "seed luck" in report


def test_cutout_scale_sweep_artifact_parses():
    """Round-5 resolution of the Cutout sign (VERDICT item 2): five
    measured 16-seed points across task structure, gate, teacher strength,
    and the strong-colour pair composition, plus a mechanism probe. The
    committed finding: CutMix is the sign-stable positive control at every
    point, Cutout never separates positive, and the probe shows the
    consistency signal present on every task (so signal scarcity is not
    the explanation)."""
    d = os.path.join(ROOT, "cutout_scale_sweep")
    points = ["ls64", "ctx64", "ctx64_gate97", "ctx64_sup24_gate97",
              "ctx64_gate97_colour"]
    sup_arms = {}
    for p in points:
        rec = json.load(open(os.path.join(d, p, "results.json")))
        assert rec["n_seeds"] == 16 and rec["iters"] >= 6000, p
        arms = rec["arms"]
        mm, co = arms["mask_mt"], arms["cutout"]
        assert len(co["gain_per_seed"]) == 16, p
        # CutMix positive control: positive mean, >= 3/4 seed majority
        assert mm["gain_mean"] > 0, p
        assert sum(g > 0 for g in mm["gain_per_seed"]) >= 12, p
        # the measured finding: Cutout never separates positive
        assert co["gain_mean"] < co["gain_std"], p
        assert sum(g > 0 for g in co["gain_per_seed"]) <= 8, p
        sup_arms[p] = arms["supervised"]["miou_per_seed"]
    # internal consistency: the supervised arm (cons_weight=0) reproduces
    # bit-identically across gate / colour variants of the same task+n_sup
    assert sup_arms["ctx64"] == sup_arms["ctx64_gate97"]
    assert sup_arms["ctx64"] == sup_arms["ctx64_gate97_colour"]
    # mechanism probe: the visible-pixel consistency signal is present on
    # every task and the gates pass most pixels — signal scarcity refuted
    mech = json.load(open(os.path.join(d, "mechanism_probe.json")))
    assert set(mech["tasks"]) == {"shapes", "large_shapes", "context_size"}
    for task, r in mech["tasks"].items():
        assert min(r["visible_argmax_flip_rate"]) > 0.03, task
        assert min(r["gate_rate_0.97"]) > 0.8, task
    report = open(os.path.join(d, "report.md")).read()
    assert "refuted" in report and "16/16" in report
    assert "positive" in report and "control" in report  # may line-wrap


def test_reference_baseline_artifact_parses():
    """Round-4 measured baseline anchor: the reference's own torch-CPU
    iteration timed on this host; the committed TPU-vs-reference-CPU ratio
    must equal chip_rate / measured reference rate."""
    rec = json.load(open(os.path.join(ROOT, "reference_baseline",
                                      "baseline.json")))
    ref_rate = rec["reference_torch_cpu_img_per_sec"]
    assert 0.0 < ref_rate < 5.0  # a real 1-core R101 CPU rate
    assert rec["measured_tpu_vs_reference_cpu"] == pytest.approx(
        rec["chip_img_per_sec_bench"] / ref_rate, rel=0.02)
    assert "ESTIMATE" in rec["note"]


def test_space_to_batch_probe_artifact_parses():
    """Round-4 adopt-or-refute evidence for the space-to-batch dilated-conv
    lever: numerically identical on the full step and measured within a few
    percent of the direct lowering (the refutation is the result)."""
    rec = json.load(open(os.path.join(ROOT, "space_to_batch", "probe.json")))
    assert rec["forward_max_abs_diff_bf16"] == 0.0
    d = rec["variants"]["direct"]["step_ms"]
    s = rec["variants"]["s2b"]["step_ms"]
    assert d > 50 and s > 50  # real-chip steps
    assert abs(s - d) / d < 0.05
    assert rec["speedup_s2b_vs_direct"] == pytest.approx(d / s, abs=1e-3)


def test_shape_alignment_table_parses():
    """Round-4 shape-alignment evidence: the paper recipe's odd shapes
    (bs10 -> 20-image internal batches padding 20->24 sublanes; 321^2 -> 41^2
    OS8 maps padding 41->48 lanes) must cost measurably vs the 8-aligned
    variants — the committed proof that the remaining MFU gap is
    conv-shape-structural, not an unexplored lever."""
    path = os.path.join(ROOT, "shape_alignment", "probe.json")
    if not os.path.exists(path):
        pytest.skip("shape-alignment table not committed yet")
    rec = json.load(open(path))
    v = rec["variants"]
    paper = v["bs10_crop321"]
    assert paper["step_ms"] > 50  # real chip
    # the paper recipe is the honesty point: its img/s matches bench's
    # ballpark and the sublane-aligned bs12 variant is more efficient
    # per pixel
    assert 70.0 < paper["img_per_sec_per_chip"] < 100.0
    aligned = v["bs12_crop321"]
    assert (aligned["megapixel_per_sec_per_chip"]
            > paper["megapixel_per_sec_per_chip"])


def test_mfu_profile_artifact_parses():
    d = json.load(open(os.path.join(ROOT, "mfu_profile.json")))
    assert d["backend"] == "tpu"
    fs = d["full_step"]
    assert fs["xla_flops_per_step"] > 1e13 - 1e12  # ~11.3 TF per step
    assert 30.0 < fs["effective_tflops"] < d["v5e_bf16_peak_tflops"]
    assert 15.0 < fs["pct_of_v5e_bf16_peak"] < 100.0
    assert fs["img_per_sec_per_chip"] > 60.0
    assert "isolated_conv_caveat" in d


def test_trajectory_drift_artifact_parses():
    """Round-5: the 100-step long-horizon differential drift curve + eval
    parity point (scripts/trajectory_drift_probe.py). Divergence must be
    numerical-accumulation-sized, the conf gate bit-stable, and the eval
    parity point tight."""
    path = os.path.join(ROOT, "trajectory_drift", "drift.json")
    doc = json.load(open(path))
    assert doc["config"]["n_steps"] >= 100
    s = doc["summary"]
    # f32-accumulation scale, not a semantic leak
    assert s["max_rel_sup_second_half"] < 0.02
    assert s["max_rel_cons_second_half"] < 0.05
    assert s["conf_rate_max_abs_diff"] <= 5e-3
    # the semantic criterion: our cross-framework drift must be comparable
    # to the reference's OWN chaotic divergence from a 1e-7-perturbed copy
    # of itself under the same batches (measured 1.02x at 100 steps) —
    # absolute drift grows with horizon through Adam's sign-normalised
    # updates even between two runs of the same code — or, in the early
    # injection-dominated regime, a small fraction of the weight movement
    fd = s["final_drift"]
    assert (s["drift_vs_chaos_classifier"] < 3.0
            or fd["stu_classifier_drift_over_movement"] < 0.15)
    n = doc["config"]["n_steps"]
    assert len(doc["per_step"]["ref_sup"]) == n
    assert len(doc["rel_diff"]["sup"]) == n
    assert len(doc["drift_curve"]) >= n // doc["config"].get("record", 5)
    e = doc["eval_parity"]
    assert e["abs_miou_diff"] <= 0.02
    # identical weights through both eval paths: near-total agreement
    assert e["crossload_pixel_agreement"] >= 0.995


def test_xla_flag_sweep_artifact_parses():
    """Round-5 closure of the compiler-options dimension
    (scripts/xla_flag_probe.py): the two plausible single-chip XLA:TPU knobs
    (latency-hiding scheduler toggle, scoped-VMEM scratch budget) measured
    on the adopted bench recipe via PJRT compiler_options — the channel
    that actually reaches the remote TPU compiler here. The refutation is
    the result: the default configuration wins every variant."""
    rec = json.load(open(os.path.join(ROOT, "xla_flag_sweep", "probe.json")))
    assert "compiler_options" in rec["transport"]
    v = rec["variants"]
    base = v["baseline"]
    assert base["step_ms"] > 50  # real-chip step
    losses = set()
    for name in ("baseline", "lhs_off", "vmem_80mib", "vmem_112mib"):
        r = v[name]
        assert not r.get("failed"), name
        assert r["vs_baseline"] == pytest.approx(
            base["step_ms"] / r["step_ms"], abs=1e-3)
        losses.add(r["sup_loss_after_warmup_and_iters"])
    # same program, same data: every compiler variant must agree on loss
    assert len(losses) == 1
    # no variant beat the default by more than timing noise
    assert max(r["vs_baseline"] for r in v.values()) < 1.01


def test_op_breakdown_artifact_parses():
    """Round-5 per-op trace forensics (scripts/op_breakdown.py): the XPlane
    "XLA Ops" line of a jax.profiler trace of the adopted bench recipe,
    aggregated by XLA's own hlo_category stat. The before/after pair is the
    evidence for the one-hot CE fix: before, a ~1.5 GB/s zero-FLOP "custom
    fusion" (the supervised CE's take_along_axis gather) burned >10% of
    device-busy time; after, it is gone and convolution fusions own >90%."""
    before = json.load(open(
        os.path.join(ROOT, "op_breakdown", "probe_before_onehot_ce.json")))
    after = json.load(open(os.path.join(ROOT, "op_breakdown", "probe.json")))

    def cats(rec):
        return {c["name"]: c for c in rec["category_breakdown"]}

    cb, ca = cats(before), cats(after)
    # the gather custom-fusion: >10% of busy, ~zero flops, before only
    assert cb["custom fusion"]["pct_of_device_busy"] > 10
    assert cb["custom fusion"]["tflops_per_s"] < 0.1
    assert ca.get("custom fusion", {"ms_per_step": 0})["ms_per_step"] < 0.5
    # the fix removed >10 ms/step of device-busy time
    assert (before["device_busy_ms_per_step"]
            - after["device_busy_ms_per_step"]) > 10
    # convs dominate the remaining step and run at real MXU rates
    assert ca["convolution fusion"]["pct_of_device_busy"] > 85
    assert ca["convolution fusion"]["tflops_per_s"] > 80
    # busy time per step stays below the measured wall step (sanity: the
    # overlapping-timeline double-count this parser exists to avoid)
    assert after["device_busy_ms_per_step"] < 130
