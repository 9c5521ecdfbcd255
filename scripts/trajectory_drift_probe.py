"""Long-horizon mask_mt trajectory drift + eval-path parity probe.

Round-4 VERDICT weak 2: the trainer-trajectory differentials prove the step
math over 6-8 optimizer steps but do not bound how the divergence GROWS
(numerical f32 accumulation vs a slow semantic leak), and never compare the
two eval paths inside the same run. This probe runs the reference's literal
CutMix mean-teacher inner loop (its OWN ResNetDeepLab / EMAWeightOptimizer /
two-LR Adam; train_seg_semisup_mask_mt.py:287-467) against our fused step
from identical imported weights/batches/masks for N (default 100) optimizer
steps, recording:

  * per-step losses on both sides and their relative differences — a
    semantic leak shows as systematic growth far beyond f32 rounding; pure
    numerical accumulation stays small and grows slowly/noisily;
  * parameter drift (max |ours - theirs|) for student conv1 / classifier and
    the EMA teacher classifier every few steps — the drift CURVE itself;
  * the eval parity block (VERDICT item 4b): after the N steps, the
    reference's literal eval procedure (eval_net.eval(), per-batch argmax,
    per-sample EvaluatorIoU accumulation; train_seg_semisup_mask_mt.py:
    484-517) on ITS final teacher vs our eval path (eval/evaluator.py
    make_eval_cm_fn + ops/iou.EvaluatorIoU) on OUR final teacher — the
    end-of-run mIoU parity point — plus a cross-loaded control: our eval
    path on the REFERENCE's final teacher weights, isolating eval-path
    differences from accumulated weight drift (pixel agreement + mIoU).

    python scripts/trajectory_drift_probe.py --steps 100 \
        --out results_evidence/trajectory_drift
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
REF_DIR = os.environ.get("CUTMIX_REF_DIR", "/root/reference")


def _import_reference():
    if REF_DIR not in sys.path:
        sys.path.append(REF_DIR)  # append: never shadow this repo's modules
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvr = types.ModuleType("torchvision.models.resnet")
        tv.models = tvm
        tvm.resnet = tvr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.models.resnet"] = tvr
    from architectures import deeplab2 as r_dl
    import evaluation as r_eval
    import optim_weight_ema as r_ema

    return r_dl, r_eval, r_ema


def run(n_steps=100, record_every=5, seed=0):
    import torch
    import torch.nn.functional as F
    from torch import nn

    import jax
    import jax.numpy as jnp

    r_dl, r_eval, r_ema = _import_reference()

    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        ModelState,
        OptimizerConfig,
        TrainState,
        create_train_state,
    )
    from cutmix_seg_tpu.eval.evaluator import make_eval_cm_fn
    from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig, sample_masks
    from cutmix_seg_tpu.models import torch_import
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.ops.iou import EvaluatorIoU
    from cutmix_seg_tpu.semisup.mask_mt import (
        MaskConsistencyConfig,
        make_mask_mt_step,
    )

    C, layers, HW, B = 4, (1, 1, 1, 1), 48, 3
    LR, ALPHA, CW, CONF = 2e-3, 0.99, 1.0, 0.25
    box = BoxMaskConfig((0.5, 0.5))

    # ---- reference side ----
    torch.manual_seed(seed)
    clf_crossent_loss = nn.CrossEntropyLoss(ignore_index=255)

    def build_ref_side():
        stu = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C,
                                 None, None)
        tea = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C,
                                 None, None)
        for p in tea.parameters():
            p.requires_grad = False
        seen = set()
        pre_dedup = [p for p in stu.pretrained_parameters()
                     if id(p) not in seen and not seen.add(id(p))]
        opt = torch.optim.Adam([
            dict(params=pre_dedup, lr=LR * 0.1),
            dict(params=stu.new_parameters(), lr=LR)])
        return stu, tea, opt

    stu_t, tea_t, student_optim = build_ref_side()

    # chaos control: a SECOND reference replica whose initial weights are
    # perturbed by one part in 1e7 (~1-2 f32 ulps). Its divergence from the
    # unperturbed reference measures how fast THE REFERENCE'S OWN dynamics
    # amplify rounding-level differences (Adam sign-normalises updates, so
    # any f32 gradient flip near zero costs ~lr of drift per step) — the
    # yardstick a cross-framework drift must be compared against.
    stu_t2, tea_t2, student_optim2 = build_ref_side()
    with torch.no_grad():
        for p2, p1 in zip(stu_t2.state_dict().values(),
                          stu_t.state_dict().values()):
            p2.copy_(p1)
            if p2.dtype.is_floating_point:
                p2.mul_(1.0 + 1e-7)
    teacher_optim = r_ema.EMAWeightOptimizer(tea_t, stu_t, ALPHA)
    teacher_optim2 = r_ema.EMAWeightOptimizer(tea_t2, stu_t2, ALPHA)
    for net in (stu_t, tea_t, stu_t2, tea_t2):
        net.train()
        net.freeze_batchnorm()

    # ---- our side: identical imported weights ----
    model = SegModel(
        name="deeplab2_tiny", module=DeepLab2(num_classes=C, layers=layers),
        mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
        param_label=_param_label, load_pretrained=None)
    opt_cfg = OptimizerConfig(opt_type="adam", learning_rate=LR,
                              lr_schedule=make_lr_schedule("none", LR, 10**6))
    state, tx = create_train_state(model, opt_cfg, jax.random.PRNGKey(7),
                                   input_hw=(HW, HW), mean_teacher=True,
                                   pretrained=False)
    sd = {k: v.numpy().copy() for k, v in stu_t.state_dict().items()}
    params_u, stats_u = torch_import.map_torch_resnet(sd)
    head_u = torch_import.map_hung_deeplab_classifier(sd)
    variables = {"params": state.student.params,
                 "batch_stats": state.student.batch_stats}
    variables, _, s1 = torch_import.merge_updates(
        variables, {"backbone": params_u}, {"backbone": stats_u})
    variables, _, s2 = torch_import.merge_updates(
        variables, {"classifier": head_u}, {})
    assert s1 == 0 and s2 == 0
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = TrainState(
        step=state.step,
        student=ModelState(params=variables["params"],
                           batch_stats=variables["batch_stats"]),
        teacher=ModelState(params=copy(variables["params"]),
                           batch_stats=copy(variables["batch_stats"])),
        opt_state=tx.init(variables["params"]),
        rng=state.rng,
    )
    cfg = MaskConsistencyConfig(
        mask_mode="mix", box=box, cons_loss_fn="var", cons_weight=CW,
        conf_thresh=CONF, conf_per_pixel=False, freeze_bn=True,
        mean_teacher=True, teacher_alpha=ALPHA, pallas_cutmix="off")
    step = jax.jit(make_mask_mt_step(model, tx, cfg))

    rng = np.random.RandomState(seed)
    init_ref = {k: v.numpy().copy() for k, v in stu_t.state_dict().items()
                if k in ("conv1.weight", "layer5.conv2d_list.0.weight")}

    def rand_batch():
        b = {
            "sup_x": rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32),
            "sup_y": rng.randint(0, C, (B, HW, HW)).astype(np.int32),
        }
        b["sup_y"][b["sup_y"] == 0] = np.where(
            rng.uniform(size=(b["sup_y"] == 0).sum()) < 0.3, 255, 0)
        for k in ("ux0", "ux1"):
            x = rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32)
            b[f"{k}_tea"] = x
            b[f"{k}_stu"] = x
        for k in ("um0", "um1"):
            um = np.ones((B, HW, HW, 1), np.float32)
            y0, x0 = rng.randint(0, HW, 2)
            um[:, y0:, x0:] = 0.0
            b[k] = um
        return b

    t = lambda a: torch.tensor(np.transpose(a, (0, 3, 1, 2)))

    def drift_point(it):
        fin = stu_t.state_dict()
        tea_fin = tea_t.state_dict()
        our_p = state.student.params
        our_t = state.teacher.params

        def maxabs(our_hwio, ref_oihw):
            return float(np.abs(np.asarray(our_hwio).transpose(3, 2, 0, 1)
                                - ref_oihw.numpy()).max())

        # movement = how far the reference's own weights travelled from
        # init; the honest yardstick for cross-framework drift (Adam's
        # sign-normalised updates amplify any f32 gradient difference up to
        # ~lr per step, so ABSOLUTE drift grows with horizon even when the
        # trajectories are semantically identical — the ratio stays small)
        move_cls = float(np.abs(fin["layer5.conv2d_list.0.weight"].numpy()
                                - init_ref["layer5.conv2d_list.0.weight"]).max())
        move_c1 = float(np.abs(fin["conv1.weight"].numpy()
                               - init_ref["conv1.weight"]).max())
        d_cls = maxabs(our_p["classifier"]["aspp0"]["kernel"],
                       fin["layer5.conv2d_list.0.weight"])
        # chaos baseline: the perturbed reference replica vs the reference —
        # SAME code, same batches/masks, 1e-7 initial difference
        fin2 = stu_t2.state_dict()
        chaos_cls = float(np.abs(
            fin2["layer5.conv2d_list.0.weight"].numpy()
            - fin["layer5.conv2d_list.0.weight"].numpy()).max())
        chaos_c1 = float(np.abs(fin2["conv1.weight"].numpy()
                                - fin["conv1.weight"].numpy()).max())
        return {
            "step": it,
            "stu_conv1": maxabs(our_p["backbone"]["conv1"]["kernel"],
                                fin["conv1.weight"]),
            "stu_conv1_chaos": chaos_c1,
            "stu_conv1_movement": move_c1,
            "stu_classifier": d_cls,
            "stu_classifier_chaos": chaos_cls,
            "stu_classifier_movement": move_cls,
            "stu_classifier_drift_over_movement": (
                round(d_cls / move_cls, 6) if move_cls > 0 else 0.0),
            "tea_classifier": maxabs(
                our_t["classifier"]["aspp0"]["kernel"],
                tea_fin["layer5.conv2d_list.0.weight"]),
        }

    per_step = {"ref_sup": [], "our_sup": [], "ref_cons": [], "our_cons": [],
                "ref_conf": [], "our_conf": []}
    drift = [drift_point(0)]
    t0 = time.time()

    def ref_iteration(stu, tea, opt, ema, batch, m_t):
        """The reference's literal iteration (:287-467)."""
        opt.zero_grad()
        logits_sup = stu(t(batch["sup_x"]))
        sup_loss = clf_crossent_loss(
            logits_sup, torch.tensor(batch["sup_y"].astype(np.int64)))
        sup_loss.backward()
        ux_mixed = t(batch["ux0_stu"]) * (1 - m_t) + t(batch["ux1_stu"]) * m_t
        um_mixed = (torch.tensor(np.transpose(batch["um0"], (0, 3, 1, 2)))
                    * (1 - m_t)
                    + torch.tensor(np.transpose(batch["um1"], (0, 3, 1, 2)))
                    * m_t)
        with torch.no_grad():
            logits_u0 = tea(t(batch["ux0_tea"])).detach()
            logits_u1 = tea(t(batch["ux1_tea"])).detach()
        logits_stu = stu(ux_mixed)
        logits_tea = logits_u0 * (1 - m_t) + logits_u1 * m_t
        prob_tea = F.softmax(logits_tea, dim=1)
        prob_stu = F.softmax(logits_stu, dim=1)
        conf_mask = (prob_tea.max(dim=1)[0] >= CONF).float()[:, None, :, :]
        loss_mask = um_mixed * conf_mask.mean()
        delta = prob_stu - prob_tea
        cons = ((delta * delta).sum(dim=1, keepdim=True) * loss_mask).mean()
        (cons * CW).backward()
        opt.step()
        ema.step()
        return (float(sup_loss.detach()), float(cons.detach()),
                float(conf_mask.mean()))

    for it in range(n_steps):
        batch = rand_batch()
        k_mask = jax.random.split(state.rng, 5)[1]
        masks = np.asarray(sample_masks(box, k_mask, B, (HW, HW),
                                        dtype=jnp.float32))
        m_t = torch.tensor(np.transpose(masks, (0, 3, 1, 2)))

        sl, cl, cf = ref_iteration(stu_t, tea_t, student_optim,
                                   teacher_optim, batch, m_t)
        per_step["ref_sup"].append(sl)
        per_step["ref_cons"].append(cl)
        per_step["ref_conf"].append(cf)
        # chaos control replica: SAME code, SAME batches/masks, 1e-7 init
        ref_iteration(stu_t2, tea_t2, student_optim2, teacher_optim2,
                      batch, m_t)

        # our fused step
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()},
                              jnp.float32(1.0))
        per_step["our_sup"].append(float(metrics["sup_loss"]))
        per_step["our_cons"].append(float(metrics["cons_loss"]))
        per_step["our_conf"].append(float(metrics["conf_rate"]))

        if (it + 1) % record_every == 0 or it + 1 == n_steps:
            drift.append(drift_point(it + 1))
        if (it + 1) % 20 == 0:
            print(f"step {it + 1}/{n_steps} "
                  f"({time.time() - t0:.0f}s) "
                  f"sup {per_step['ref_sup'][-1]:.4f}/"
                  f"{per_step['our_sup'][-1]:.4f}", flush=True)

    rs, os_ = np.array(per_step["ref_sup"]), np.array(per_step["our_sup"])
    rc, oc = np.array(per_step["ref_cons"]), np.array(per_step["our_cons"])
    rel_sup = np.abs(os_ - rs) / np.maximum(np.abs(rs), 1e-8)
    rel_cons = np.abs(oc - rc) / np.maximum(np.abs(rc), 1e-8)
    half = n_steps // 2

    # ---- eval parity block ----
    val_x = rng.normal(0, 1, (8, HW, HW, 3)).astype(np.float32)
    val_y = rng.randint(0, C, (8, HW, HW)).astype(np.int32)
    val_y[val_y == 0] = np.where(
        rng.uniform(size=(val_y == 0).sum()) < 0.2, 255, 0)

    # reference eval: its literal per-sample loop with ITS final teacher
    tea_t.eval()
    ref_ev = r_eval.EvaluatorIoU(C)
    ref_preds = []
    with torch.no_grad():
        for s0 in range(0, 8, 4):
            logits = tea_t(t(val_x[s0:s0 + 4]))
            pred_y = torch.argmax(logits, dim=1).detach().cpu().numpy()
            ref_preds.append(pred_y)
            for i in range(len(pred_y)):
                ref_ev.sample(val_y[s0 + i], pred_y[i], ignore_value=255)
    ref_preds = np.concatenate(ref_preds)
    ref_iou = ref_ev.score()
    ref_miou = float(ref_iou.mean())

    # our eval path with OUR final teacher
    eval_fn = make_eval_cm_fn(model, C)
    our_ev = EvaluatorIoU(C)
    for s0 in range(0, 8, 4):
        cm = eval_fn(state.teacher, {"x": jnp.asarray(val_x[s0:s0 + 4]),
                                     "y": jnp.asarray(val_y[s0:s0 + 4])})
        our_ev.update_cm(np.asarray(cm))
    our_miou = float(our_ev.miou())

    # cross-loaded control: our eval path on the REFERENCE's final teacher
    sd_tea = {k: v.numpy().copy() for k, v in tea_t.state_dict().items()}
    p_u, st_u = torch_import.map_torch_resnet(sd_tea)
    h_u = torch_import.map_hung_deeplab_classifier(sd_tea)
    xvars = {"params": state.teacher.params,
             "batch_stats": state.teacher.batch_stats}
    xvars, _, x1 = torch_import.merge_updates(
        xvars, {"backbone": p_u}, {"backbone": st_u})
    xvars, _, x2 = torch_import.merge_updates(xvars, {"classifier": h_u}, {})
    assert x1 == 0 and x2 == 0
    xstate = ModelState(params=xvars["params"],
                        batch_stats=xvars["batch_stats"])
    from cutmix_seg_tpu.eval.evaluator import predict_fn

    x_preds = []
    x_ev = EvaluatorIoU(C)
    for s0 in range(0, 8, 4):
        pred = np.asarray(predict_fn(model, xstate,
                                     jnp.asarray(val_x[s0:s0 + 4])))
        x_preds.append(pred)
        cm = eval_fn(xstate, {"x": jnp.asarray(val_x[s0:s0 + 4]),
                              "y": jnp.asarray(val_y[s0:s0 + 4])})
        x_ev.update_cm(np.asarray(cm))
    x_preds = np.concatenate(x_preds)

    return {
        "config": {"n_steps": n_steps, "record": record_every,
                   "layers": list(layers), "classes": C,
                   "crop": HW, "batch": B, "lr": LR, "conf_thresh": CONF,
                   "teacher_alpha": ALPHA, "seed": seed,
                   "device": "cpu (torch fp32 vs XLA:CPU f32)"},
        "per_step": {k: [round(float(v), 6) for v in vs]
                     for k, vs in per_step.items()},
        "rel_diff": {
            "sup": [round(float(v), 8) for v in rel_sup],
            "cons": [round(float(v), 8) for v in rel_cons],
        },
        "drift_curve": drift,
        "summary": {
            "max_rel_sup_first_half": round(float(rel_sup[:half].max()), 6),
            "max_rel_sup_second_half": round(float(rel_sup[half:].max()), 6),
            "max_rel_cons_first_half": round(float(rel_cons[:half].max()), 6),
            "max_rel_cons_second_half": round(float(rel_cons[half:].max()), 6),
            "final_drift": drift[-1],
            # cross-framework drift relative to the reference's OWN chaotic
            # amplification of a 1e-7 init difference: ~1 means our
            # divergence is indistinguishable from rounding-level chaos
            "drift_vs_chaos_classifier": (
                round(drift[-1]["stu_classifier"]
                      / max(drift[-1]["stu_classifier_chaos"], 1e-12), 3)),
            "conf_rate_max_abs_diff": round(float(np.abs(
                np.array(per_step["ref_conf"])
                - np.array(per_step["our_conf"])).max()), 6),
        },
        "eval_parity": {
            "ref_eval_ref_teacher_miou": round(ref_miou, 6),
            "our_eval_our_teacher_miou": round(our_miou, 6),
            "abs_miou_diff": round(abs(ref_miou - our_miou), 6),
            "ref_per_class_iou": [round(float(x), 6) for x in ref_iou],
            "our_per_class_iou": [round(float(x), 6)
                                  for x in our_ev.score()],
            # control: identical (reference) weights through both eval paths
            "crossload_pixel_agreement": round(
                float((x_preds == ref_preds).mean()), 6),
            "crossload_our_eval_miou": round(float(x_ev.miou()), 6),
        },
        "seconds": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--record_every", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(
        REPO, "results_evidence", "trajectory_drift"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    doc = run(n_steps=args.steps, record_every=args.record_every)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "drift.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["summary"], indent=1))
    print(json.dumps(doc["eval_parity"], indent=1))


if __name__ == "__main__":
    main()
