"""Multi-seed algorithm-convergence sweep — seeds vmapped, loop scanned.

Statistical upgrade of tools/synthetic_benchmark.py (round-3 VERDICT items
5+7): every consistency algorithm the framework implements — CutMix
(mask_mt), Cutout, ICT, VAT, aug_mt — against a shared per-seed supervised
baseline, at n >= 5 seeds, reporting mean +/- std gains. Configs mirror the
reference sweep (reference: run_pascal_aug_experiments.sh:19-25): CutMix
prop 0.5 / Cutout prop 0.0:1.0 / ICT alpha 0.1 / VAT adaptive r=1 cw=0.1 /
aug_mt cw=1.0, all with the confidence gate.

TPU-shaped execution, designed for ONE chip:

  * seeds are a ``jax.vmap`` axis: K independent train states and datasets
    advance in one program (the multi-seed axis of parallel/multi_seed.py,
    realised with vmap instead of a device axis);
  * the ENTIRE training loop is a ``lax.scan`` over precomputed per-iteration
    index/geometry arrays with all datasets device-resident — one dispatch
    trains all K seeds for all iterations (the round-3 per-iteration host
    loop paid ~0.13 s/iter of tunnel dispatch latency; the scan removes all
    of it);
  * aug_mt uses the reference's FULL pair geometry — the Hung crop-scale
    pair + pair flips (train_seg_semisup_aug_mt.py:146-158,
    seg_transforms_cv.py:232-303) sampled host-side by the trainers' own
    sampler (aug/params.py::sample_geom_pair) and warped on device by the
    separable MXU path, valid masks from warp coverage — replacing the
    round-3 translation-only approximation.

    python -m cutmix_seg_tpu.tools.multi_seed_convergence --iters 6000 \
        --n_seeds 8 --out results_evidence/algo_convergence_multiseed
"""

from __future__ import annotations

import json
import os
import time

import click
import jax
import jax.numpy as jnp
import numpy as np

from cutmix_seg_tpu.tools.synthetic_benchmark import make_image

HW = (64, 64)
C = 4
AUG_MARGIN = 16
TASK = "shapes"


def make_image_large(rng, hw):
    """Large-object variant of synthetic_benchmark.make_image: 1-3 shapes
    with radii ~h/5..h/2, so a Cutout box (prop 0.0:1.0) typically erases
    PART of an object while the rest stays visible — the context-
    predictable regime where the paper finds Cutout positive on VOC
    (reference: run_pascal_aug_experiments.sh:21,32; the 64x64 small-shape
    task measured Cutout at -0.3 +/- 2.8 because erased interiors are not
    determined by their context there)."""
    h, w = hw
    img = rng.uniform(0.2, 0.5, size=(1, 1, 3)) + rng.uniform(
        -0.08, 0.08, size=(h, w, 3))
    labels = np.zeros((h, w), np.int32)
    ys, xs = np.mgrid[0:h, 0:w]
    for _ in range(rng.randint(1, 4)):
        cls = rng.randint(1, 4)
        colour = np.array([0.9, 0.2, 0.2]) if cls == 1 else (
            np.array([0.2, 0.9, 0.2]) if cls == 2
            else np.array([0.3, 0.3, 0.95]))
        colour = colour + rng.uniform(-0.1, 0.1, size=3)
        if rng.randint(2) == 0:
            cy = rng.randint(h // 6, 5 * h // 6)
            cx = rng.randint(w // 6, 5 * w // 6)
            r = rng.randint(h // 5, h // 2)
            mask = (ys - cy) ** 2 + (xs - cx) ** 2 <= r * r
        else:
            hh, ww = rng.randint(h // 3, 3 * h // 4), rng.randint(
                w // 3, 3 * w // 4)
            y0, x0 = rng.randint(0, h - h // 3), rng.randint(0, w - w // 3)
            mask = (ys >= y0) & (ys < y0 + hh) & (xs >= x0) & (xs < x0 + ww)
        img[mask] = colour + rng.uniform(-0.05, 0.05,
                                         size=(int(mask.sum()), 3))
        labels[mask] = cls
    img = np.clip(img + rng.normal(0, 0.03, size=img.shape), 0, 1)
    return (img * 255).astype(np.uint8), labels


def make_image_context(rng, hw):
    """Context-dependent pixel identity: classes 1 and 2 are discs of the
    SAME colour distribution, distinguished only by size (small vs large);
    class 3 is a colour-anchored rectangle. A pixel's class cannot be read
    from local colour alone — the network must integrate surrounding
    extent. This is the regime the reference's Cutout consistency targets:
    its cut branch applies the loss on VISIBLE pixels only
    (reference: train_seg_semisup_mask_mt.py:401 loss_mask = mask * um),
    so the gradient only carries signal when zeroing boxes (removing
    context) perturbs predictions elsewhere. On locally colour-determined
    tasks that perturbation is ~0, which is why the shapes/large_shapes
    points measure Cutout as a null (-0.3 +/- 2.8 and -0.9 +/- 3.5)."""
    h, w = hw
    img = rng.uniform(0.2, 0.5, size=(1, 1, 3)) + rng.uniform(
        -0.08, 0.08, size=(h, w, 3))
    labels = np.zeros((h, w), np.int32)
    ys, xs = np.mgrid[0:h, 0:w]

    def disc(cls, r_lo, r_hi):
        colour = np.array([0.85, 0.3, 0.25]) + rng.uniform(-0.1, 0.1, size=3)
        cy = rng.randint(h // 8, 7 * h // 8)
        cx = rng.randint(w // 8, 7 * w // 8)
        r = rng.randint(r_lo, r_hi)
        m = (ys - cy) ** 2 + (xs - cx) ** 2 <= r * r
        img[m] = colour + rng.uniform(-0.05, 0.05, size=(int(m.sum()), 3))
        labels[m] = cls

    for _ in range(rng.randint(1, 3)):   # large discs first
        disc(2, max(h // 4, 2), max(h // 3, 3))
    for _ in range(rng.randint(2, 6)):   # small discs may overlay
        disc(1, max(h // 16, 1), max(h // 9, 2))
    for _ in range(rng.randint(0, 3)):   # colour-anchored rectangles
        colour = np.array([0.3, 0.3, 0.95]) + rng.uniform(-0.1, 0.1, size=3)
        hh, ww = rng.randint(6, h // 3), rng.randint(6, w // 3)
        y0, x0 = rng.randint(0, h - 6), rng.randint(0, w - 6)
        m = (ys >= y0) & (ys < y0 + hh) & (xs >= x0) & (xs < x0 + ww)
        img[m] = colour + rng.uniform(-0.05, 0.05, size=(int(m.sum()), 3))
        labels[m] = 3
    img = np.clip(img + rng.normal(0, 0.03, size=img.shape), 0, 1)
    return (img * 255).astype(np.uint8), labels


_TASK_GENS = {"shapes": make_image, "large_shapes": make_image_large,
              "context_size": make_image_context}


def _gen_set(rng, n, hw):
    gen = _TASK_GENS[TASK]
    xs, ys = [], []
    for _ in range(n):
        x, y = gen(rng, hw)
        xs.append(x)
        ys.append(y)
    return ((np.stack(xs).astype(np.float32) / 255.0 - 0.5) / 0.25,
            np.stack(ys))


def build_seed_data(seed, n_sup, n_unsup, n_val, aug_src):
    """Per-seed datasets; sup/val are drawn FIRST so they are identical
    across algorithms (the unsup draw consumes size-dependent randomness)."""
    rng = np.random.RandomState(1000 + seed)
    sup_x, sup_y = _gen_set(rng, n_sup, HW)
    val_x, val_y = _gen_set(rng, n_val, HW)
    src_hw = (HW[0] + AUG_MARGIN, HW[1] + AUG_MARGIN) if aug_src else HW
    unsup_x, _ = _gen_set(rng, n_unsup, src_hw)
    return dict(sup_x=sup_x, sup_y=sup_y, val_x=val_x, val_y=val_y,
                unsup_x=unsup_x)


def _aug_geometry(iters, batch, seeds):
    """Hung crop-scale PAIR geometry for every (iter, seed, sample): the
    trainers' own host sampler, vectorised composition to grid space."""
    from cutmix_seg_tpu.aug import affine as A
    from cutmix_seg_tpu.aug.params import GeomConfig, sample_geom_pair

    geom = GeomConfig(crop_size=HW, mode="crop_scale_hung",
                      crop_offset=(AUG_MARGIN, AUG_MARGIN), hflip=True)
    src_hw = (HW[0] + AUG_MARGIN, HW[1] + AUG_MARGIN)
    K = len(seeds)
    m0 = np.zeros((iters, K, batch, 2, 3), np.float32)
    m1 = np.zeros((iters, K, batch, 2, 3), np.float32)
    for k, seed in enumerate(seeds):
        rng = np.random.RandomState(3000 + seed)
        for it in range(iters):
            for b in range(batch):
                (a0, _i0), (a1, _i1) = sample_geom_pair(
                    geom, src_hw, rng, False)
                m0[it, k, b] = a0
                m1[it, k, b] = a1
    flat0 = m0.reshape(-1, 2, 3).astype(np.float64)
    flat1 = m1.reshape(-1, 2, 3).astype(np.float64)
    xf_cv = A.compose(flat1, A.invert(flat0))
    xf_grid = A.cv_to_grid(xf_cv, HW).astype(np.float32).reshape(m0.shape)
    return m0, m1, xf_grid


def make_arm_runner(model, tx, cfg, make_step, algorithm, n_sup, n_unsup,
                    batch, strong_colour=False):
    """One jitted program: scan the full training loop, vmapped over seeds.

    strong_colour reproduces the reference's pair composition on device:
    the teacher sees the un-jittered view and the student the
    colour-jittered one (reference: train_seg_semisup_mask_mt.py:166-179
    — ToPair then TVT colour applied to pair-sample1 only; the MoCo-recipe
    jitter of seg_transforms_cv.py:549-584). Keys ride the ``ck`` stream."""
    from cutmix_seg_tpu.aug.device import warp_image_canvas_separable
    from cutmix_seg_tpu.ops.colour import ColourJitterConfig, colour_jitter

    step_fn = make_step(model, tx, cfg)
    use_cons = cfg.cons_weight > 0.0
    cj_cfg = ColourJitterConfig()  # the trainers' strong-colour defaults

    def stu_view(x, ck, salt):
        """Student view: colour jitter in [0,1] space (data is normalised
        to (x/255 - 0.5) / 0.25 by _gen_set)."""
        if not strong_colour:
            return x
        key = jax.random.fold_in(jax.random.PRNGKey(97), ck + salt)
        x01 = jnp.clip(x * 0.25 + 0.5, 0.0, 1.0)
        return (colour_jitter(x01, key, cj_cfg) - 0.5) / 0.25

    def seed_iter(state, data, xs, ramp):
        bt = {"sup_x": jnp.take(data["sup_x"], xs["s"], axis=0),
              "sup_y": jnp.take(data["sup_y"], xs["s"], axis=0)}
        ck = xs["ck"][0] if strong_colour else 0
        if use_cons:
            ones = jnp.ones(((batch,) + HW + (1,)), jnp.float32)
            u0 = jnp.take(data["unsup_x"], xs["u0"], axis=0)
            if algorithm in ("mask_mt", "ict"):
                u1 = jnp.take(data["unsup_x"], xs["u1"], axis=0)
                bt.update(ux0_tea=u0, ux0_stu=stu_view(u0, ck, 0), um0=ones,
                          ux1_tea=u1, ux1_stu=stu_view(u1, ck, 1), um1=ones)
            elif algorithm in ("vat_mt", "cutout"):
                bt.update(ux_tea=u0, ux_stu=stu_view(u0, ck, 0), um=ones)
            else:  # aug_mt: full Hung pair geometry, warped on device
                src = jnp.take(data["unsup_x"], xs["u0"], axis=0)
                sizes = jnp.full((batch, 2), HW[0] + AUG_MARGIN, jnp.int32)
                x0, v0 = warp_image_canvas_separable(
                    src, xs["m0"], sizes, HW)
                x1, v1 = warp_image_canvas_separable(
                    src, xs["m1"], sizes, HW)
                bt.update(ux0=x0, ux1=x1, um0=v0, um1=v1,
                          xf0_to_1=xs["xf"])
        return step_fn(state, bt, ramp)

    viter = jax.vmap(seed_iter, in_axes=(0, 0, 0, None))

    def run_arm(state, data, stream, ramps):
        def body(carry, t_xs):
            xs, ramp = t_xs
            new_state, metrics = viter(carry, data, xs, ramp)
            return new_state, metrics["sup_loss"]

        state, losses = jax.lax.scan(body, state, (stream, ramps))
        return state, losses

    return jax.jit(run_arm, donate_argnums=(0,))


def stack_states(model, opt_cfg, seeds):
    """K independent train states stacked on a leading seed axis (the
    optimizer transformation is identical across seeds)."""
    from cutmix_seg_tpu.core.train_state import create_train_state

    pairs = [create_train_state(model, opt_cfg, jax.random.PRNGKey(s),
                                input_hw=HW, mean_teacher=True,
                                pretrained=False) for s in seeds]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[st for st, _ in pairs])
    return stacked, pairs[0][1]


@click.command()
@click.option("--iters", type=int, default=6000)
@click.option("--n_seeds", type=int, default=8)
@click.option("--n_sup", type=int, default=6)
@click.option("--n_unsup", type=int, default=256)
@click.option("--n_val", type=int, default=64)
@click.option("--batch", type=int, default=8)
@click.option("--algorithms", default="mask_mt,cutout,ict,vat_mt,aug_mt")
@click.option("--hw", type=int, default=64, help="square task size")
@click.option("--task", type=click.Choice(
    ["shapes", "large_shapes", "context_size"]), default="shapes")
@click.option("--conf_thresh", type=float, default=0.8)
@click.option("--strong_colour", is_flag=True, default=False,
              help="reference pair composition: student views colour-"
                   "jittered on device, teacher views clean")
@click.option("--out", default="results_evidence/algo_convergence_multiseed")
def main(iters, n_seeds, n_sup, n_unsup, n_val, batch, algorithms, hw, task,
         conf_thresh, strong_colour, out):
    global HW, TASK
    HW = (hw, hw)
    TASK = task
    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import OptimizerConfig
    from cutmix_seg_tpu.eval.evaluator import make_eval_cm_fn
    from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.ops.iou import EvaluatorIoU
    from cutmix_seg_tpu.semisup.aug_cons import AugConsConfig, make_aug_cons_step
    from cutmix_seg_tpu.semisup.ict import ICTConfig, make_ict_step
    from cutmix_seg_tpu.semisup.mask_mt import (
        MaskConsistencyConfig,
        make_mask_mt_step,
    )
    from cutmix_seg_tpu.semisup.vat import VATConfig, make_vat_step
    from cutmix_seg_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    t_start = time.time()
    seeds = list(range(n_seeds))
    algos = [a.strip() for a in algorithms.split(",") if a.strip()]

    model = SegModel(
        name="tiny_deeplab_synth",
        module=DeepLab2(num_classes=C, layers=(1, 1, 2, 1)),
        mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
        param_label=_param_label)
    opt_cfg = OptimizerConfig(opt_type="adam", learning_rate=1e-3,
                              lr_schedule=make_lr_schedule("none", 1e-3,
                                                           iters))
    # configs mirror the reference sweep (run_pascal_aug_experiments.sh:19-25)
    common = dict(conf_thresh=conf_thresh, freeze_bn=True, mean_teacher=True,
                  teacher_alpha=0.99)
    arm_cfgs = {
        "supervised": (MaskConsistencyConfig(
            mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)), cons_weight=0.0,
            pallas_cutmix="off", **common), make_mask_mt_step, "mask_mt"),
        "mask_mt": (MaskConsistencyConfig(
            mask_mode="mix", box=BoxMaskConfig((0.5, 0.5)), cons_weight=1.0,
            pallas_cutmix="off", **common), make_mask_mt_step, "mask_mt"),
        "cutout": (MaskConsistencyConfig(
            mask_mode="zero", box=BoxMaskConfig((0.0, 1.0)), cons_weight=1.0,
            pallas_cutmix="off", **common), make_mask_mt_step, "cutout"),
        "ict": (ICTConfig(ict_alpha=0.1, cons_weight=1.0, **common),
                make_ict_step, "ict"),
        "vat_mt": (VATConfig(vat_radius=1.0, adaptive_vat_radius=True,
                             cons_weight=0.1, **common),
                   make_vat_step, "vat_mt"),
        "aug_mt": (AugConsConfig(cons_weight=1.0, **common),
                   make_aug_cons_step, "aug_mt"),
    }

    ramps = jnp.asarray(np.minimum(1.0, np.arange(iters) / (iters * 0.3)),
                        jnp.float32)
    eval_fn = make_eval_cm_fn(model, C)

    aug_geom = None
    results = {}
    for arm in ["supervised"] + algos:
        cfg, make_step, algorithm = arm_cfgs[arm]
        t0 = time.time()
        data_np = [build_seed_data(s, n_sup, n_unsup, n_val,
                                   aug_src=(algorithm == "aug_mt"))
                   for s in seeds]
        data = {k: jnp.asarray(np.stack([d[k] for d in data_np]))
                for k in ("sup_x", "sup_y", "unsup_x")}
        # per-iteration index streams (T, K, B)
        stream = {}
        for name, off, hi in (("s", 0, n_sup), ("u0", 101, n_unsup),
                              ("u1", 203, n_unsup)):
            # distinct per-stream offsets: u0 and u1 MUST draw independent
            # batches (CutMix between two identical batches is a no-op).
            # Collision-free encoding (seed stride 1000 >> max offset): the
            # earlier 2000 + s*17 + off had 203-101 = 6*17, making seed s's
            # u1 stream identical to seed (s+6)'s u0 stream at n_seeds=8.
            arr = np.stack([np.random.RandomState(2000 + s * 1000 + off)
                            .randint(0, hi, size=(iters, batch))
                            for s in seeds], axis=1)
            stream[name] = jnp.asarray(arr.astype(np.int32))
        if strong_colour:
            # globally-unique colour-jitter key material per (iter, seed);
            # the runner folds in a per-view salt {0, 1}
            ck = (np.arange(iters)[:, None] * n_seeds
                  + np.arange(n_seeds)[None, :]) * 2
            stream["ck"] = jnp.asarray(ck[..., None].astype(np.int32))
        if algorithm == "aug_mt":
            if aug_geom is None:
                print("sampling aug_mt pair geometry "
                      f"({iters}x{n_seeds}x{batch})...", flush=True)
                aug_geom = _aug_geometry(iters, batch, seeds)
            m0, m1, xf = aug_geom
            stream.update(m0=jnp.asarray(m0), m1=jnp.asarray(m1),
                          xf=jnp.asarray(xf))

        state, tx = stack_states(model, opt_cfg, seeds)
        runner = make_arm_runner(model, tx, cfg, make_step, algorithm,
                                 n_sup, n_unsup, batch,
                                 strong_colour=strong_colour)
        # chunk the scan: one 6000-iteration dispatch crashed the remote TPU
        # worker; ~500-iteration dispatches keep the per-call program small
        # while still amortising tunnel dispatch latency ~500x
        chunk = min(500, iters)
        loss_chunks = []
        for c0 in range(0, iters, chunk):
            sl = slice(c0, min(c0 + chunk, iters))
            xs_c = {k: v[sl] for k, v in stream.items()}
            state, losses = runner(state, data, xs_c, ramps[sl])
            loss_chunks.append(np.asarray(losses))
        losses = np.concatenate(loss_chunks)

        mious = []
        for k in range(n_seeds):
            ev = EvaluatorIoU(C)
            for s0 in range(0, n_val, batch):
                cm = eval_fn(
                    jax.tree_util.tree_map(lambda x, k=k: x[k],
                                           state.teacher),
                    {"x": jnp.asarray(data_np[k]["val_x"][s0:s0 + batch]),
                     "y": jnp.asarray(data_np[k]["val_y"][s0:s0 + batch])})
                ev.update_cm(np.asarray(cm))
            mious.append(ev.miou())
        results[arm] = {
            "miou_per_seed": [round(m, 4) for m in mious],
            "mean": round(float(np.mean(mious)), 4),
            "std": round(float(np.std(mious)), 4),
            "final_sup_loss_mean": round(float(losses[-1].mean()), 4),
            "seconds": round(time.time() - t0, 1),
        }
        print(arm, json.dumps(results[arm]), flush=True)
        # durable partial progress: completed arms survive a cutoff
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "results_partial.json"), "w") as f:
            json.dump({"arms": results, "n_seeds": n_seeds,
                       "iters": iters}, f, indent=2)

    sup = np.array(results["supervised"]["miou_per_seed"])
    for arm in algos:
        arr = np.array(results[arm]["miou_per_seed"])
        gains = arr - sup
        results[arm]["gain_per_seed"] = [round(g, 4) for g in gains]
        results[arm]["gain_mean"] = round(float(gains.mean()), 4)
        results[arm]["gain_std"] = round(float(gains.std()), 4)

    out_doc = {
        "task": f"synthetic {task}, {C} classes, {HW[0]}x{HW[1]}",
        "n_seeds": n_seeds, "iters": iters, "n_sup": n_sup,
        "configs": "reference sweep configs "
                   "(run_pascal_aug_experiments.sh:19-25); conf gate "
                   f"{conf_thresh}; strong_colour={strong_colour}; "
                   "aug_mt = full Hung crop-scale pair geometry",
        "arms": results,
        "total_seconds": round(time.time() - t_start, 1),
        "device": str(jax.devices()[0]),
    }
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "results.json"), "w") as f:
        json.dump(out_doc, f, indent=2)
    print(json.dumps(out_doc))


if __name__ == "__main__":
    main()
