"""Multi-seed trainer: K split seeds of ANY consistency algorithm in ONE
XLA program.

The paper's Cityscapes/ISIC tables average 5 split seeds, which the reference
runs as 5 sequential single-GPU jobs (reference:
run_cityscapes_experiments.sh:4-8, run_isic2017_experiments.sh:4-8). This
trainer vmaps the chosen algorithm's fused step (--algorithm
{mask_mt,ict,vat_mt,aug_mt}) over a leading seed axis and shards that
axis over the mesh — each device (or device group) trains its own seed with
zero cross-seed communication, turning a 5-job sweep into one run.

Usage mirrors train.mask_mt with ``--parallel_split_seeds "12345,23456,..."``
replacing --split_seed; every other flag carries over. Per-epoch logs print
one reference-format line per seed.
"""

from __future__ import annotations

import time

import click
import jax
import jax.numpy as jnp
import numpy as np

from cutmix_seg_tpu.core import checkpoint as ckpt
from cutmix_seg_tpu.core import job
from cutmix_seg_tpu.core.train_state import create_train_state
from cutmix_seg_tpu.data import datasets
from cutmix_seg_tpu.data.loader import HostBatchBuilder, train_stream
from cutmix_seg_tpu.ops.colour import ColourJitterConfig
from cutmix_seg_tpu.aug.params import GeomConfig
from cutmix_seg_tpu.parallel.mesh import make_mesh
from cutmix_seg_tpu.parallel.multi_seed import (
    make_multi_seed_step,
    stack_pytrees,
    unstack_state,
)
from cutmix_seg_tpu.train import common
from cutmix_seg_tpu.train.cli_common import common_options
from cutmix_seg_tpu.utils.rampup import sigmoid_rampup


def train_seg_semisup_mask_mt_multiseed(ctx: job.RunContext, **p):
    from cutmix_seg_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    # the seed axis is vmapped through one program: features that change the
    # per-seed program structure are not wired through — reject them loudly
    # rather than parse-and-ignore
    for flag in ("grad_accum", "spatial_train"):
        if int(p.get(flag, 1) or 1) > 1:
            raise ValueError(
                f"--{flag} is not supported by the multi-seed trainer; run "
                "the single-seed CLI per seed instead")
    seeds = [int(s.strip()) for s in p["parallel_split_seeds"].split(",")]
    K = len(seeds)
    crop_hw = common.parse_crop_size(p["crop_size"])

    # per-seed data splits (same source; split selection differs per seed)
    ds_dicts = [datasets.load_dataset(
        p["dataset"], p["n_val"], p["val_seed"], p["n_sup"], p["n_unsup"],
        split_seed, p["split_path"]) for split_seed in seeds]
    ds = ds_dicts[0]["ds_src"]
    n_classes = ds.num_classes
    val_ndx = ds_dicts[0]["val_ndx_tgt"]
    print("Loaded data")
    for k, d in enumerate(ds_dicts):
        print(f"seed {seeds[k]}: len(sup_ndx)={len(d['sup_ndx'])} "
              f"len(unsup_ndx)={len(d['unsup_ndx'])}")

    model = common.build_model(p["arch"], n_classes,
                               p.get("compute_dtype", "bfloat16"))
    mean, std = common.resolve_mean_std(model, ds)

    if p["iters_per_epoch"] == -1:
        p["iters_per_epoch"] = len(ds_dicts[0]["unsup_ndx"]) // p["batch_size"]
    total_iters = p["iters_per_epoch"] * p["num_epochs"]
    opt_cfg = common.build_optimizer_config(
        p["opt_type"], p["learning_rate"], p["lr_sched"], p["lr_step_epochs"],
        p["lr_step_gamma"], p["lr_poly_power"], total_iters,
        p["iters_per_epoch"], p["sgd_momentum"], p["sgd_nesterov"],
        p["sgd_weight_decay"])

    mean_teacher = p["model"] == "mean_teacher"
    states = []
    for k in range(K):
        s, tx = create_train_state(
            model, opt_cfg, jax.random.PRNGKey(p.get("seed", 0) + k),
            input_hw=(65, 65), mean_teacher=mean_teacher,
            pretrained=not p.get("no_pretrained", False))
        states.append(s)
    mstate = stack_pytrees(states)
    print("Built networks")

    algo = p.get("algorithm", "mask_mt")
    if algo == "mask_mt":
        from cutmix_seg_tpu.train.mask_mt import build_spec

        # vmap over the Pallas custom call is not supported; jnp blend
        spec, cfg = build_spec(p, pallas_cutmix="off")
    elif algo == "ict":
        from cutmix_seg_tpu.train.ict import build_spec

        spec, cfg = build_spec(p)
    elif algo == "vat_mt":
        from cutmix_seg_tpu.train.vat_mt import build_spec

        spec, cfg = build_spec(p)
    elif algo == "aug_mt":
        from cutmix_seg_tpu.train.aug_mt import build_spec

        spec, cfg = build_spec(p)
    else:
        raise ValueError(f"unknown algorithm {algo!r}")

    n_dev = len(jax.devices()) if p.get("n_devices", -1) == -1 else p["n_devices"]
    mesh = make_mesh(min(n_dev, K))
    mstep = make_multi_seed_step(spec.make_step(model, tx, None), mesh)

    geom = GeomConfig.from_cli(
        crop_hw, p["aug_scale_hung"], p["aug_max_scale"], p["aug_rot_mag"],
        p["aug_scale_non_uniform"], p["aug_hflip"], p["aug_vflip"],
        p["aug_hvflip"])
    if spec.pair_geom and "aug_offset_range" in p:
        import dataclasses as _dc

        off = p["aug_offset_range"]
        geom = _dc.replace(
            geom, crop_offset=(off, off),
            constrain_rot_scale=not p.get("aug_free_scale_rot", False))
    colour = (ColourJitterConfig(
        brightness=p["aug_colour_brightness"], contrast=p["aug_colour_contrast"],
        saturation=p["aug_colour_saturation"], hue=p["aug_colour_hue"],
        apply_prob=p["aug_colour_prob"],
        greyscale_prob=p["aug_colour_greyscale_prob"])
        if p["aug_strong_colour"] else None)
    augmentor = common.DeviceAugmentor(mean, std, crop_hw, geom.mode, colour)

    use_cons = p["cons_weight"] > 0.0
    sup_builder = HostBatchBuilder(ds, geom, with_labels=True,
                                   n_threads=p["num_workers"])
    unsup_builder = HostBatchBuilder(ds, geom, with_labels=False,
                                     pair_geom=spec.pair_geom,
                                     n_threads=p["num_workers"])
    sup_streams = []
    useed_streams = []  # per seed: list of spec.unsup_streams streams
    base = p.get("seed", 0)
    colour_key = jax.random.PRNGKey(base + 40)

    def close_streams():
        for s in sup_streams:
            s.close()
        for streams_k in useed_streams:
            for s in streams_k:
                s.close()
        sup_streams.clear(), useed_streams.clear()

    def open_epoch_streams(epoch_i):
        """Epoch-folded stream seeds + colour key: same bit-exact-resume
        contract as the engine (train/engine.py::_open_epoch_streams)."""
        nonlocal colour_key
        close_streams()
        ep = common.epoch_stream_seed(base, epoch_i)
        for k in range(K):
            sup_streams.append(train_stream(
                sup_builder, ds_dicts[k]["sup_ndx"], p["batch_size"],
                seed=ep + 10 + k * 100))
            streams_k = []
            if use_cons:
                ub = p["batch_size"] * p["unsup_batch_ratio"]
                for si in range(spec.unsup_streams):
                    streams_k.append(train_stream(
                        unsup_builder, ds_dicts[k]["unsup_ndx"], ub,
                        seed=ep + 20 + si * 10 + k * 100))
            useed_streams.append(streams_k)
        colour_key = common.epoch_colour_key(base, epoch_i)

    start_epoch = 0
    if p.get("resume"):
        latest = ckpt.latest_checkpoint(ctx.checkpoint_dir)
        if latest is not None:
            mstate = ckpt.restore_checkpoint(latest, mstate)
            start_epoch = (int(np.asarray(mstate.step)[0])
                           // max(p["iters_per_epoch"], 1))
            print(f"Resumed from {latest} at epoch {start_epoch}")

    # spec.fetch reads engine.crop_hw only (aug_mt's host-side pair affine)
    shim = type("EngineShim", (), {"crop_hw": crop_hw})()

    def seed_batch(k, key):
        sup = augmentor.sup(next(sup_streams[k]))
        batch = {"sup_x": sup["image"], "sup_y": sup["labels"]}
        if use_cons:
            raw = spec.fetch(shim, useed_streams[k])
            batch.update(spec.compose(augmentor, raw, key))
        return batch

    print("Training...")
    epoch_mious = []
    for epoch_i in range(start_epoch, p["num_epochs"]):
        t1 = time.time()
        open_epoch_streams(epoch_i)
        ramp_val = sigmoid_rampup(epoch_i, p["rampup"]) if p["rampup"] > 0 else 1.0
        metric_accum = []
        for _ in range(p["iters_per_epoch"]):
            colour_key, *keys = jax.random.split(colour_key, K + 1)
            mbatch = stack_pytrees([seed_batch(k, keys[k]) for k in range(K)])
            mstate, metrics = mstep(mstate, mbatch, jnp.float32(ramp_val))
            metric_accum.append(metrics)

        m = {k: np.stack([np.asarray(mm[k]) for mm in metric_accum]).mean(axis=0)
             for k in metric_accum[0]}
        if common.check_nan(float(np.asarray(m["sup_loss"]).sum())):
            close_streams()
            return

        t2 = time.time()
        epoch_mious = []
        for k in range(K):
            seed_state = unstack_state(mstate, k)
            eval_state = (seed_state.teacher if mean_teacher
                          else seed_state.student)
            iou = common.evaluate(
                model, eval_state, ds, val_ndx, p["batch_size"], mesh,
                n_classes, mean, std, model.block_size, p["bin_fill_holes"])
            epoch_mious.append(float(iou.mean()))
            print("Epoch {} [seed {}]: took {:.3f}s, TRAIN clf loss={:.6f}, "
                  "consistency loss={:.6f}, conf rate={:.3%}, VAL mIoU={:.3%}"
                  .format(epoch_i + 1, seeds[k], t2 - t1,
                          float(m["sup_loss"][k]),
                          float(m.get("cons_loss", np.zeros(K))[k]),
                          float(m.get("conf_rate", np.zeros(K))[k]),
                          iou.mean()))
            ctx.log_metrics({"epoch": epoch_i + 1, "seed": seeds[k],
                             "sup_loss": float(m["sup_loss"][k]),
                             "val_miou": float(iou.mean())})
        ci = max(1, int(p.get("checkpoint_interval", 1)))
        if (epoch_i + 1) % ci == 0 or epoch_i + 1 == p["num_epochs"]:
            ckpt.save_checkpoint(ctx.checkpoint_dir, mstate,
                                 int(np.asarray(mstate.step)[0]))

    # the paper-table aggregate: mean +/- std over the split seeds
    # (reference README.md reports 5-seed mean/stddev rows)
    arr = np.asarray(epoch_mious)
    if arr.size:
        # sample std needs n>1; a single seed reports 0 (not NaN — bare NaN
        # in the metrics JSONL breaks strict JSON parsers)
        std = float(arr.std(ddof=1)) if arr.size > 1 else 0.0
        print("SEEDS AGGREGATE ({}): VAL mIoU mean={:.3%} std={:.3%} n={}"
              .format(",".join(str(s) for s in seeds), arr.mean(), std, K))
        ctx.log_metrics({"final_seed_mious": epoch_mious,
                         "final_miou_mean": float(arr.mean()),
                         "final_miou_std": std})

    close_streams()


@click.command()
@common_options(with_geom_pair_opts=True)
@click.option("--algorithm", type=click.Choice(
    ["mask_mt", "ict", "vat_mt", "aug_mt"]), default="mask_mt",
    help="which consistency algorithm the sweep trains")
@click.option("--mask_mode", type=click.Choice(["zero", "mix"]), default="mix")
@click.option("--mask_prop_range", type=str, default="0.5")
@click.option("--boxmask_n_boxes", type=int, default=1)
@click.option("--boxmask_fixed_aspect_ratio", is_flag=True, default=False)
@click.option("--boxmask_by_size", is_flag=True, default=False)
@click.option("--boxmask_outside_bounds", is_flag=True, default=False)
@click.option("--boxmask_no_invert", is_flag=True, default=False)
@click.option("--ict_alpha", type=float, default=0.1)
@click.option("--vat_radius", type=float, default=0.5)
@click.option("--adaptive_vat_radius", is_flag=True, default=False)
@click.option("--vat_dir_from_student", is_flag=True, default=False)
@click.option("--parallel_split_seeds", type=str,
              default="12345,23456,34567,45678,56789",
              help="comma-separated split seeds trained simultaneously, one "
                   "mesh shard each")
def experiment(job_desc, **params):
    job.submit("train_seg_semisup_mask_mt_multiseed", job_desc,
               train_seg_semisup_mask_mt_multiseed, params)


if __name__ == "__main__":
    experiment()
