"""Standalone model evaluation: saved weights -> per-class IoU / mIoU.

Evaluates a trained network (the trainer's final ``model.msgpack`` from
``--save_model``, or any full-TrainState checkpoint from ``checkpoints/``)
on a dataset's val or test split with the exact training-time metric
pipeline: sharded eval program per batch, integer confusion accumulation,
reference IoU semantics incl. 2-class hole filling (ops/iou.py). The
reference has no standalone evaluator — its metric is only reachable by
re-running a trainer — but a deployment workflow needs one.

    python -m cutmix_seg_tpu.tools.evaluate_model \
        --dataset pascal_aug --arch resnet101_deeplab_imagenet \
        --model_path results/train_seg_semisup_mask_mt/run/model.msgpack

    python -m cutmix_seg_tpu.tools.evaluate_model ... \
        --checkpoint results/.../checkpoints --net teacher --split test
"""

from __future__ import annotations

import click
import jax
import numpy as np


@click.command()
@click.option("--dataset", type=str, required=True)
@click.option("--arch", type=str, required=True)
@click.option("--model_path", type=str, default=None,
              help="model.msgpack from --save_model (params+stats)")
@click.option("--checkpoint", type=str, default=None,
              help="checkpoint file or checkpoints/ dir (full TrainState)")
@click.option("--net", type=click.Choice(["teacher", "student"]),
              default="teacher",
              help="which network to evaluate from a full checkpoint")
@click.option("--split", type=click.Choice(["val", "test"]), default="val")
@click.option("--batch_size", type=int, default=8)
@click.option("--n_val", type=int, default=-1)
@click.option("--val_seed", type=int, default=131)
@click.option("--split_seed", type=int, default=12345)
@click.option("--split_path", type=str, default=None)
@click.option("--bin_fill_holes", is_flag=True, default=False)
@click.option("--eval_spatial", is_flag=True, default=False)
@click.option("--compute_dtype", type=str, default="bfloat16")
@click.option("--n_devices", type=int, default=-1)
def main(dataset, arch, model_path, checkpoint, net, split, batch_size,
         n_val, val_seed, split_seed, split_path, bin_fill_holes,
         eval_spatial, compute_dtype, n_devices):
    if (model_path is None) == (checkpoint is None):
        raise click.UsageError(
            "pass exactly one of --model_path / --checkpoint")

    from cutmix_seg_tpu.core import checkpoint as ckpt
    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        OptimizerConfig,
        create_train_state,
    )
    from cutmix_seg_tpu.data import datasets
    from cutmix_seg_tpu.parallel.mesh import make_mesh
    from cutmix_seg_tpu.train import common
    from cutmix_seg_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    ds_dict = datasets.load_dataset(dataset, n_val, val_seed, n_sup=-1,
                                    n_unsup=-1, split_seed=split_seed,
                                    split_path=split_path)
    ds = ds_dict["ds_src"]
    ndx = (ds_dict["test_ndx_tgt"] if split == "test"
           else ds_dict["val_ndx_tgt"])
    if ndx is None:
        raise click.UsageError(f"dataset {dataset!r} has no {split} split")

    model = common.build_model(arch, ds.num_classes, compute_dtype)
    mean, std = common.resolve_mean_std(model, ds)

    # a fresh student ModelState provides the restore template (shapes are
    # input-size independent; (65,65) keeps the init program small). The
    # checkpoint is read as a raw msgpack dict and only the requested
    # network sub-tree is restored, so the template never has to match the
    # run's optimizer chain (adam vs sgd) or mean-teacher mode.
    import flax

    opt_cfg = OptimizerConfig(opt_type="adam", learning_rate=1e-3,
                              lr_schedule=make_lr_schedule("none", 1e-3, 1))
    template, _ = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(65, 65),
        mean_teacher=False, pretrained=False)

    if model_path is not None:
        model_state = ckpt.restore_checkpoint(model_path, template.student)
        src = model_path
    else:
        import os

        path = (ckpt.latest_checkpoint(checkpoint)
                if os.path.isdir(checkpoint) else checkpoint)
        if path is None:
            raise click.UsageError(f"no checkpoints under {checkpoint!r}")
        with open(path, "rb") as f:
            raw = flax.serialization.msgpack_restore(f.read())
        sub = raw[net]
        if not sub.get("params"):
            raise click.UsageError(
                f"checkpoint {path!r} has no {net} network (pi-model runs "
                "keep no separate teacher; use --net student)")
        model_state = flax.serialization.from_state_dict(
            template.student, sub)
        src = f"{path} ({net})"

    n_dev = len(jax.devices()) if n_devices == -1 else n_devices
    # same mesh contract as the engine: evaluate(spatial=True) re-maps the
    # mesh's devices onto the image H axis itself (train/common.py)
    mesh = make_mesh(n_dev)
    print(f"Evaluating {src} on {dataset}/{split} "
          f"({len(ndx)} images, {n_dev} devices"
          f"{', spatial' if eval_spatial else ''})")
    iou = common.evaluate(model, model_state, ds, ndx, batch_size, mesh,
                          ds.num_classes, mean, std, model.block_size,
                          bin_fill_holes, spatial=eval_spatial)
    print("{} mIoU={:.3%}".format(split.upper(), iou.mean()))
    print("-- {}".format(", ".join(f"{x:.3%}" for x in iou)))


if __name__ == "__main__":
    main()
