"""Mask-driven semi-supervised trainer (CutMix / Cutout mean-teacher) — the
headline experiment.

CLI-compatible re-design of the reference trainer
(reference: train_seg_semisup_mask_mt.py, flags catalogued in
CMDLINE_OPTIONS.md): same flags and printed epoch line, plus TPU-native
extras (--compute_dtype, --n_devices, --resume, --nan_check_interval).

Pipeline per iteration: host canvases (prefetched threads) -> one fused
device augmentation per stream -> one fused train step (see
cutmix_seg_tpu.semisup.mask_mt). Evaluation runs the EMA teacher with exact
integer IoU accumulation. Checkpoints every epoch, resumable.
"""

from __future__ import annotations

import math
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
from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig
from cutmix_seg_tpu.ops.colour import ColourJitterConfig
from cutmix_seg_tpu.parallel.mesh import jit_sharded_step, make_mesh, shard_batch
from cutmix_seg_tpu.semisup.mask_mt import MaskConsistencyConfig, make_mask_mt_step
from cutmix_seg_tpu.train import common
from cutmix_seg_tpu.utils.rampup import sigmoid_rampup
from cutmix_seg_tpu.aug.params import GeomConfig


def train_seg_semisup_mask_mt(
    ctx: job.RunContext, dataset, model, arch, freeze_bn,
    opt_type, sgd_momentum, sgd_nesterov, sgd_weight_decay,
    learning_rate, lr_sched, lr_step_epochs, lr_step_gamma, lr_poly_power,
    teacher_alpha, bin_fill_holes,
    crop_size, aug_hflip, aug_vflip, aug_hvflip, aug_scale_hung,
    aug_max_scale, aug_scale_non_uniform, aug_rot_mag,
    aug_strong_colour, aug_colour_brightness, aug_colour_contrast,
    aug_colour_saturation, aug_colour_hue, aug_colour_prob,
    aug_colour_greyscale_prob,
    mask_mode, mask_prop_range,
    boxmask_n_boxes, boxmask_fixed_aspect_ratio, boxmask_by_size,
    boxmask_outside_bounds, boxmask_no_invert,
    cons_loss_fn, cons_weight, conf_thresh, conf_per_pixel, rampup,
    unsup_batch_ratio, num_epochs, iters_per_epoch, batch_size,
    n_sup, n_unsup, n_val, split_seed, split_path, val_seed,
    save_preds, save_model, num_workers,
    compute_dtype="bfloat16", n_devices=-1, resume=False,
    nan_check_interval=100, seed=0,
):
    settings = {k: v for k, v in locals().items() if k != "ctx"}

    prop_range = common.parse_prop_range(mask_prop_range)
    crop_hw = common.parse_crop_size(crop_size)
    if crop_hw is None:
        raise ValueError("the TPU pipeline requires a crop_size (static shapes)")
    if mask_mode not in ("mix", "zero"):
        raise ValueError(f"unknown mask_mode {mask_mode}")
    mask_mix = mask_mode == "mix"

    # ---- data ----
    ds_dict = datasets.load_dataset(
        dataset, n_val, val_seed, n_sup, n_unsup, split_seed, split_path)
    ds_src = ds_dict["ds_src"]
    sup_ndx, unsup_ndx = ds_dict["sup_ndx"], ds_dict["unsup_ndx"]
    val_ndx, test_ndx = ds_dict["val_ndx_tgt"], ds_dict["test_ndx_tgt"]
    n_classes = ds_src.num_classes
    if bin_fill_holes and n_classes != 2:
        print("Binary hole filling can only be used with binary (2-class) "
              "segmentation datasets")
        return
    print("Loaded data")

    # ---- model / optimizer / state ----
    seg_model = common.build_model(arch, n_classes, compute_dtype)
    mean, std = common.resolve_mean_std(seg_model, ds_src)

    if iters_per_epoch == -1:
        iters_per_epoch = len(unsup_ndx) // batch_size
    total_iters = iters_per_epoch * num_epochs
    opt_cfg = common.build_optimizer_config(
        opt_type, learning_rate, lr_sched, lr_step_epochs, lr_step_gamma,
        lr_poly_power, total_iters, iters_per_epoch, sgd_momentum,
        sgd_nesterov, sgd_weight_decay)

    mean_teacher = model == "mean_teacher"
    if model not in ("mean_teacher", "pi"):
        print(f"Unknown model type {model}")
        return
    state, tx = create_train_state(
        seg_model, opt_cfg, jax.random.PRNGKey(seed), input_hw=crop_hw,
        mean_teacher=mean_teacher)
    print("Built network")

    start_epoch = 0
    if resume:
        latest = ckpt.latest_checkpoint(ctx.checkpoint_dir)
        if latest is not None:
            state = ckpt.restore_checkpoint(latest, state)
            start_epoch = int(state.step) // max(iters_per_epoch, 1)
            print(f"Resumed from {latest} at epoch {start_epoch}")

    # ---- algorithm config ----
    cfg = MaskConsistencyConfig(
        mask_mode=mask_mode,
        box=BoxMaskConfig(
            prop_range=prop_range,
            n_boxes=boxmask_n_boxes,
            random_aspect_ratio=not boxmask_fixed_aspect_ratio,
            prop_by_area=not boxmask_by_size,
            within_bounds=not boxmask_outside_bounds,
            invert=not boxmask_no_invert,
        ),
        cons_loss_fn=cons_loss_fn,
        cons_weight=cons_weight,
        conf_thresh=conf_thresh,
        conf_per_pixel=conf_per_pixel,
        freeze_bn=freeze_bn,
        mean_teacher=mean_teacher,
        teacher_alpha=teacher_alpha,
        unsup_batch_ratio=unsup_batch_ratio,
    )

    mesh = make_mesh(None if n_devices == -1 else n_devices)
    n_data = mesh.shape["data"]
    step = jit_sharded_step(make_mask_mt_step(seg_model, tx, cfg), mesh)

    # ---- augmentation / loaders ----
    geom = GeomConfig.from_cli(
        crop_hw, aug_scale_hung, aug_max_scale, aug_rot_mag,
        aug_scale_non_uniform, aug_hflip, aug_vflip, aug_hvflip)
    colour = (
        ColourJitterConfig(
            brightness=aug_colour_brightness, contrast=aug_colour_contrast,
            saturation=aug_colour_saturation, hue=aug_colour_hue,
            apply_prob=aug_colour_prob,
            greyscale_prob=aug_colour_greyscale_prob)
        if aug_strong_colour else None
    )
    augmentor = common.DeviceAugmentor(mean, std, crop_hw, geom.mode, colour)

    global_batch = batch_size * n_data
    sup_builder = HostBatchBuilder(ds_src, geom, with_labels=True,
                                   n_threads=num_workers)
    sup_stream = train_stream(sup_builder, sup_ndx, global_batch, seed=seed + 10)
    use_cons = cons_weight > 0.0
    if use_cons:
        unsup_builder = HostBatchBuilder(ds_src, geom, with_labels=False,
                                         n_threads=num_workers)
        ub = global_batch * unsup_batch_ratio
        unsup_stream0 = train_stream(unsup_builder, unsup_ndx, ub, seed=seed + 20)
        unsup_stream1 = (
            train_stream(unsup_builder, unsup_ndx, ub, seed=seed + 30)
            if mask_mix else None
        )

    # ---- report ----
    print("Settings:")
    print(", ".join(f"{k}={settings[k]}" for k in sorted(settings)))
    print("Dataset:")
    print(f"len(sup_ndx)={len(sup_ndx)}")
    print(f"len(unsup_ndx)={len(unsup_ndx)}")
    print(f"len(val_ndx)={len(val_ndx)}")
    if test_ndx is not None:
        print(f"len(test_ndx)={len(test_ndx)}")
    if n_sup != -1:
        print(f"sup_ndx={sup_ndx.tolist()}")

    colour_key = jax.random.PRNGKey(seed + 40)

    def make_step_batch():
        nonlocal colour_key
        sup = augmentor.sup(next(sup_stream))
        batch = {"sup_x": sup["image"], "sup_y": sup["labels"]}
        if use_cons:
            colour_key, k0, k1 = jax.random.split(colour_key, 3)
            u0 = augmentor.unsup(next(unsup_stream0), k0)
            if mask_mix:
                u1 = augmentor.unsup(next(unsup_stream1), k1)
                batch.update(
                    ux0_tea=u0["image"], ux0_stu=u0["image_stu"], um0=u0["mask"],
                    ux1_tea=u1["image"], ux1_stu=u1["image_stu"], um1=u1["mask"],
                )
            else:
                batch.update(
                    ux_tea=u0["image"], ux_stu=u0["image_stu"], um=u0["mask"]
                )
        return shard_batch(mesh, batch)

    eval_state = lambda: state.teacher if mean_teacher else state.student

    # ---- training ----
    print("Training...")
    for epoch_i in range(start_epoch, num_epochs):
        t1 = time.time()
        ramp_val = sigmoid_rampup(epoch_i, rampup) if rampup > 0 else 1.0
        ramp = jnp.float32(ramp_val)

        metric_accum = []
        dead = False
        for it in range(iters_per_epoch):
            batch = make_step_batch()
            state, metrics = step(state, batch, ramp)
            metric_accum.append(metrics)
            if (it + 1) % nan_check_interval == 0:
                if common.check_nan(float(metrics["sup_loss"])):
                    dead = True
                    break
        if dead:
            return

        m = common.fetch_metrics(metric_accum)
        sup_loss_acc = m.get("sup_loss", 0.0)
        cons_loss_acc = m.get("cons_loss", 0.0)
        conf_rate_acc = m.get("conf_rate", ramp_val if rampup > 0 else 0.0)
        if common.check_nan(sup_loss_acc):
            return

        iou = common.evaluate(
            seg_model, eval_state(), ds_src, val_ndx, batch_size, mesh,
            n_classes, mean, std, seg_model.block_size, bin_fill_holes)
        miou = iou.mean()

        t2 = time.time()
        print(
            "Epoch {}: took {:.3f}s, TRAIN clf loss={:.6f}, consistency "
            "loss={:.6f}, conf rate={:.3%}, VAL mIoU={:.3%}".format(
                epoch_i + 1, t2 - t1, sup_loss_acc, cons_loss_acc,
                conf_rate_acc, miou))
        print("-- {}".format(", ".join(f"{x:.3%}" for x in iou)))

        ctx.log_metrics({
            "epoch": epoch_i + 1, "sup_loss": sup_loss_acc,
            "cons_loss": cons_loss_acc, "conf_rate": conf_rate_acc,
            "val_miou": float(miou), "epoch_time": t2 - t1,
            "images_per_sec": iters_per_epoch * global_batch / max(t2 - t1, 1e-9),
        })
        ckpt.save_checkpoint(ctx.checkpoint_dir, state, int(state.step))

    # ---- final artifacts ----
    import os

    if save_model:
        ckpt.export_params(os.path.join(ctx.run_dir, "model.msgpack"), eval_state())

    if save_preds or test_ndx is not None:
        from cutmix_seg_tpu.data.loader import eval_batches
        from cutmix_seg_tpu.eval.evaluator import predict_fn
        from cutmix_seg_tpu.aug import affine as host_affine
        from cutmix_seg_tpu.aug.device import augment_batch
        from cutmix_seg_tpu.ops.iou import EvaluatorIoU

        out_dir = os.path.join(ctx.run_dir, "preds") if save_preds else None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

        def predict_over(indices, evaluator=None):
            for batch in eval_batches(ds_src, indices, batch_size,
                                      seg_model.block_size):
                n = batch["canvas"].shape[0]
                aug = augment_batch(
                    jnp.asarray(batch["canvas"]),
                    jnp.asarray(batch["labels"]),
                    jnp.asarray(host_affine.identity(n)),
                    jnp.asarray(batch["sizes"]),
                    jnp.asarray(np.ones(n, np.int32)),
                    mean, std, None,
                    out_hw=batch["canvas"].shape[1:3], with_labels=True)
                pred = np.asarray(predict_fn(seg_model, eval_state(), aug["image"]))
                for k in range(batch["count"]):
                    i = int(batch["indices"][k])
                    h, w = batch["sizes"][k]
                    if out_dir:
                        ds_src.save_prediction_by_index(out_dir, pred[k, :h, :w], i)
                    if evaluator is not None:
                        evaluator.update_batch(
                            pred[k: k + 1, :h, :w],
                            np.asarray(aug["labels"])[k: k + 1, :h, :w])

        if save_preds:
            predict_over(val_ndx)
        if test_ndx is not None:
            test_ev = EvaluatorIoU(n_classes, bin_fill_holes)
            predict_over(test_ndx, test_ev)
            test_iou = test_ev.score()
            print("FINAL TEST: mIoU={:.3%}".format(test_iou.mean()))
            print("-- TEST {}".format(", ".join(f"{x:.3%}" for x in test_iou)))

    sup_stream.close()
    if use_cons:
        unsup_stream0.close()
        if unsup_stream1 is not None:
            unsup_stream1.close()


# ---- CLI: same surface as the reference (CMDLINE_OPTIONS.md) ----
@click.command()
@click.option("--job_desc", type=str, default="")
@click.option("--dataset", type=click.Choice(
    ["camvid", "cityscapes", "pascal", "pascal_aug", "isic2017"]),
    default="pascal_aug")
@click.option("--model", type=click.Choice(["mean_teacher", "pi"]),
              default="mean_teacher")
@click.option("--arch", type=str, default="resnet101_deeplab_imagenet")
@click.option("--freeze_bn", is_flag=True, default=False)
@click.option("--opt_type", type=click.Choice(["adam", "sgd"]), default="adam")
@click.option("--sgd_momentum", type=float, default=0.9)
@click.option("--sgd_nesterov", is_flag=True, default=False)
@click.option("--sgd_weight_decay", type=float, default=5e-4)
@click.option("--learning_rate", type=float, default=1e-4)
@click.option("--lr_sched", type=click.Choice(["none", "stepped", "cosine", "poly"]),
              default="none")
@click.option("--lr_step_epochs", type=str, default="")
@click.option("--lr_step_gamma", type=float, default=0.1)
@click.option("--lr_poly_power", type=float, default=0.9)
@click.option("--teacher_alpha", type=float, default=0.99)
@click.option("--bin_fill_holes", is_flag=True, default=False)
@click.option("--crop_size", type=str, default="321,321")
@click.option("--aug_hflip", is_flag=True, default=False)
@click.option("--aug_vflip", is_flag=True, default=False)
@click.option("--aug_hvflip", is_flag=True, default=False)
@click.option("--aug_scale_hung", is_flag=True, default=False)
@click.option("--aug_max_scale", type=float, default=1.0)
@click.option("--aug_scale_non_uniform", is_flag=True, default=False)
@click.option("--aug_rot_mag", type=float, default=0.0)
@click.option("--aug_strong_colour", is_flag=True, default=False)
@click.option("--aug_colour_brightness", type=float, default=0.4)
@click.option("--aug_colour_contrast", type=float, default=0.4)
@click.option("--aug_colour_saturation", type=float, default=0.4)
@click.option("--aug_colour_hue", type=float, default=0.1)
@click.option("--aug_colour_prob", type=float, default=0.8)
@click.option("--aug_colour_greyscale_prob", type=float, default=0.2)
@click.option("--mask_mode", type=click.Choice(["zero", "mix"]), default="mix")
@click.option("--mask_prop_range", type=str, default="0.5")
@click.option("--boxmask_n_boxes", type=int, default=1)
@click.option("--boxmask_fixed_aspect_ratio", is_flag=True, default=False)
@click.option("--boxmask_by_size", is_flag=True, default=False)
@click.option("--boxmask_outside_bounds", is_flag=True, default=False)
@click.option("--boxmask_no_invert", is_flag=True, default=False)
@click.option("--cons_loss_fn", type=click.Choice(
    ["var", "bce", "kld", "logits_var", "logits_smoothl1"]), default="var")
@click.option("--cons_weight", type=float, default=1.0)
@click.option("--conf_thresh", type=float, default=0.97)
@click.option("--conf_per_pixel", is_flag=True, default=False)
@click.option("--rampup", type=int, default=-1)
@click.option("--unsup_batch_ratio", type=int, default=1)
@click.option("--num_epochs", type=int, default=300)
@click.option("--iters_per_epoch", type=int, default=-1)
@click.option("--batch_size", type=int, default=10)
@click.option("--n_sup", type=int, default=100)
@click.option("--n_unsup", type=int, default=-1)
@click.option("--n_val", type=int, default=-1)
@click.option("--split_seed", type=int, default=12345)
@click.option("--split_path", type=click.Path(readable=True, exists=True))
@click.option("--val_seed", type=int, default=131)
@click.option("--save_preds", is_flag=True, default=False)
@click.option("--save_model", is_flag=True, default=False)
@click.option("--num_workers", type=int, default=4)
# TPU-native extras
@click.option("--compute_dtype", type=click.Choice(["bfloat16", "float32"]),
              default="bfloat16")
@click.option("--n_devices", type=int, default=-1)
@click.option("--resume", is_flag=True, default=False)
@click.option("--nan_check_interval", type=int, default=100)
@click.option("--seed", type=int, default=0)
def experiment(job_desc, **params):
    job.submit("train_seg_semisup_mask_mt", job_desc,
               train_seg_semisup_mask_mt, params)


if __name__ == "__main__":
    experiment()
