"""Multi-seed sweep demo: K split seeds trained in ONE vmapped program,
seed axis sharded over the mesh (one seed per device — the paper's 5-seed
protocol as a single parallel job; reference runs them as sequential GPU
jobs, run_cityscapes_experiments.sh:4-8).

Run on the 8-virtual-device CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/multi_seed_demo.py --seeds 12345 23456 34567 45678

Prints one reference-format epoch line PER SEED; per-seed mIoU spread is the
artifact the paper averages over.
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_e2e_cityscapes import make_zip  # noqa: E402  (sibling script)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[12345, 23456, 34567, 45678])
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--out", default=None)
    ap.add_argument("--conf_thresh", type=float, default=0.5,
                    help="confidence gate; 0 keeps the consistency term live "
                         "from random init (short-demo setting — 4 epochs "
                         "never reach the paper's 0.97 gate)")
    args = ap.parse_args()

    tmp = args.out or tempfile.mkdtemp(prefix="multiseed_")
    os.makedirs(tmp, exist_ok=True)
    zip_path = os.path.join(tmp, "cityscapes_segmentation.zip")
    make_zip(zip_path, n_train=16, n_val=4, hw=(48, 48))

    from cutmix_seg_tpu.core import job
    from cutmix_seg_tpu.data import sources
    from cutmix_seg_tpu.models import registry
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.train.multi_seed_mask_mt import (
        train_seg_semisup_mask_mt_multiseed,
    )

    orig = sources.CityscapesDataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, with_void=False,
                zip_path_arg=None):
        orig(self, n_val, val_rng, trainval_perm, with_void,
             zip_path_arg or zip_path)

    sources.CityscapesDataSource.__init__ = patched
    sources.CityscapesDataSource.canvas_hw = (48, 48)

    if "tiny_deeplab_demo" not in registry.names():
        @registry.register("tiny_deeplab_demo")
        def factory(num_classes, dtype=None, pretrained=True):
            return SegModel(
                name="tiny_deeplab_demo",
                module=DeepLab2(num_classes=num_classes, layers=(1, 1, 1, 1),
                                dtype=dtype),
                mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
                param_label=_param_label)

    p = dict(
        dataset="cityscapes", model="mean_teacher", arch="tiny_deeplab_demo",
        freeze_bn=True, opt_type="adam", sgd_momentum=0.9, sgd_nesterov=False,
        sgd_weight_decay=5e-4, learning_rate=1e-3, lr_sched="none",
        lr_step_epochs="", lr_step_gamma=0.1, lr_poly_power=0.9,
        teacher_alpha=0.99, bin_fill_holes=False, crop_size="32,32",
        aug_hflip=True, aug_vflip=False, aug_hvflip=False,
        aug_scale_hung=False, aug_max_scale=1.0, aug_scale_non_uniform=False,
        aug_rot_mag=0.0, aug_strong_colour=False, aug_colour_brightness=0.4,
        aug_colour_contrast=0.4, aug_colour_saturation=0.4,
        aug_colour_hue=0.1, aug_colour_prob=0.8,
        aug_colour_greyscale_prob=0.2, mask_mode="mix", mask_prop_range="0.5",
        boxmask_n_boxes=1, boxmask_fixed_aspect_ratio=False,
        boxmask_by_size=False, boxmask_outside_bounds=False,
        boxmask_no_invert=False, cons_loss_fn="var", cons_weight=1.0,
        conf_thresh=args.conf_thresh, conf_per_pixel=False, rampup=-1,
        unsup_batch_ratio=1, num_epochs=args.epochs,
        iters_per_epoch=args.iters, batch_size=2, n_sup=4, n_unsup=-1,
        n_val=-1,
        parallel_split_seeds=",".join(str(s) for s in args.seeds),
        split_path=None, val_seed=131, save_preds=False, save_model=False,
        num_workers=2, compute_dtype="float32", n_devices=-1, resume=False,
        nan_check_interval=100, seed=0, no_pretrained=True,
    )
    job.submit("multi_seed_demo", "run",
               train_seg_semisup_mask_mt_multiseed, p,
               results_root=os.path.join(tmp, "results"))
    print(f"artifacts in {tmp}", flush=True)


if __name__ == "__main__":
    main()
