"""Child process for the graceful-preemption test: a many-epoch tiny trainer
whose parent sends SIGTERM mid-run. Mirrors the test_trainer_e2e fixtures
(tiny cityscapes zip, tiny arch) in standalone form; argv: zip_path out_root
num_epochs job_desc [resume]."""

import sys
import zipfile
import io

import numpy as np
from PIL import Image


def build_zip(path):
    rng = np.random.RandomState(0)
    with zipfile.ZipFile(path, "w") as zf:
        for split, n in (("train", 8), ("val", 2)):
            for i in range(n):
                img = rng.randint(0, 255, size=(48, 48, 3), dtype=np.uint8)
                lab = rng.randint(7, 9, size=(48, 48), dtype=np.uint8)
                for suffix, arr in (("x", img), ("y", lab)):
                    buf = io.BytesIO()
                    Image.fromarray(arr).save(buf, format="PNG")
                    zf.writestr(f"{split}/s{i}_{suffix}.png", buf.getvalue())


def main():
    zip_path, out_root, num_epochs, job_desc = sys.argv[1:5]
    resume = len(sys.argv) > 5 and sys.argv[5] == "resume"
    import os

    if not os.path.exists(zip_path):
        build_zip(zip_path)

    from cutmix_seg_tpu.core import job
    from cutmix_seg_tpu.data import sources
    from cutmix_seg_tpu.models import registry
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label

    @registry.register("tiny_deeplab_preempt")
    def factory(num_classes, dtype=None, pretrained=True):
        return SegModel(
            name="tiny_deeplab_preempt",
            module=DeepLab2(num_classes=num_classes, layers=(1, 1, 1, 1),
                            dtype=dtype),
            mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
            param_label=_param_label)

    orig = sources.CityscapesDataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, with_void=False,
                zip_path_=None):
        orig(self, n_val, val_rng, trainval_perm, with_void,
             zip_path_ or zip_path)

    sources.CityscapesDataSource.__init__ = patched

    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    p = dict(
        dataset="cityscapes", model="mean_teacher",
        arch="tiny_deeplab_preempt",
        freeze_bn=True, opt_type="adam", sgd_momentum=0.9,
        sgd_nesterov=False, sgd_weight_decay=5e-4, learning_rate=1e-3,
        lr_sched="none", lr_step_epochs="", lr_step_gamma=0.1,
        lr_poly_power=0.9, teacher_alpha=0.9, bin_fill_holes=False,
        crop_size="32,32", aug_hflip=True, aug_vflip=False,
        aug_hvflip=False, aug_scale_hung=False, aug_max_scale=1.0,
        aug_scale_non_uniform=False, aug_rot_mag=0.0,
        aug_strong_colour=False, aug_colour_brightness=0.4,
        aug_colour_contrast=0.4, aug_colour_saturation=0.4,
        aug_colour_hue=0.1, aug_colour_prob=0.8,
        aug_colour_greyscale_prob=0.2, mask_mode="mix",
        mask_prop_range="0.5", boxmask_n_boxes=1,
        boxmask_fixed_aspect_ratio=False, boxmask_by_size=False,
        boxmask_outside_bounds=False, boxmask_no_invert=False,
        cons_loss_fn="var", cons_weight=1.0, conf_thresh=0.0,
        conf_per_pixel=False, rampup=-1, unsup_batch_ratio=1,
        num_epochs=int(num_epochs), iters_per_epoch=3, batch_size=2,
        n_sup=4, n_unsup=-1, n_val=-1, split_seed=12345, split_path=None,
        val_seed=131, save_preds=False, save_model=False, num_workers=2,
        compute_dtype="float32", n_devices=2, resume=resume,
        nan_check_interval=100, seed=0, checkpoint_interval=1,
    )
    job.submit("preempt_trainer", job_desc, train_seg_semisup_mask_mt, p,
               results_root=out_root)
    print("CHILD_EXIT_CLEAN", flush=True)


if __name__ == "__main__":
    main()
