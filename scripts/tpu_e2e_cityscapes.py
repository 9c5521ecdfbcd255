"""End-to-end trainer exercise at real data scale on the default backend.

Generates a synthetic Cityscapes-format zip at the converter's real output
resolution (512x1024 images, x/y PNG pairs per split;
reference: convert_cityscapes.py:8-52) and runs the full mask_mt trainer on
it — host decode -> transfer windows -> ONE fused XLA program per iteration
(augmentation + CutMix mean-teacher step) -> sharded EMA eval. Use this to
measure the real pipeline (not just the resident-batch bench) on TPU:

    python scripts/tpu_e2e_cityscapes.py --epochs 3 --iters 50

The per-epoch wall-clock prints in the trainer's reference-format log line.
"""

import argparse
import io
import os
import sys
import tempfile
import zipfile

import numpy as np
from PIL import Image

# runnable as `python scripts/tpu_e2e_cityscapes.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _e2e_common import base_params  # noqa: E402


def _png(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def make_zip(path, n_train=32, n_val=8, hw=(512, 1024), seed=0, task="easy"):
    rng = np.random.RandomState(seed)
    h, w = hw
    ys, xs = np.mgrid[0:h, 0:w]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        for split, n in (("train", n_train), ("val", n_val)):
            for i in range(n):
                if task == "easy":
                    img, lab = _easy_scene(rng, h, w, ys, xs, i)
                else:
                    img, lab = _hard_scene(rng, h, w, ys, xs)
                zf.writestr(f"{split}/s{i:03d}_x.png", _png(img))
                zf.writestr(f"{split}/s{i:03d}_y.png", _png(lab))
    return path


def _easy_scene(rng, h, w, ys, xs, i):
    # textured regions so the task is learnable: road below a wavy horizon,
    # buildings above, a sky band (saturates with very few labels — use
    # task='hard' for semisup-gain experiments)
    horizon = (h // 2 + (40 * np.sin(xs[0] / 97.0 + i)).astype(int))
    lab = np.full((h, w), 11, np.uint8)          # building
    lab[ys > horizon[None, :].repeat(h, 0)] = 7  # road
    lab[: h // 4] = 23                            # sky
    img = np.zeros((h, w, 3), np.uint8)
    base = {7: (110, 110, 115), 11: (160, 90, 60), 23: (200, 220, 240)}
    for cls, colour in base.items():
        m = lab == cls
        img[m] = np.asarray(colour, np.uint8)
    img = np.clip(
        img.astype(np.int16) + rng.randint(-25, 25, img.shape),
        0, 255).astype(np.uint8)
    return img, lab


# 8 non-void cityscapes label ids with per-class base colours chosen CLOSE
# together so class identity needs shape+texture, not a colour lookup —
# leaves real headroom for the consistency signal at small n_sup
_HARD_CLASSES = [
    (7, (120, 110, 105)),    # road
    (8, (135, 120, 110)),    # sidewalk
    (11, (110, 120, 130)),   # building
    (21, (105, 130, 110)),   # vegetation
    (23, (130, 130, 120)),   # sky
    (24, (125, 105, 120)),   # person
    (26, (115, 115, 140)),   # car
    (33, (140, 125, 125)),   # bicycle
]


def _hard_scene(rng, h, w, ys, xs):
    """Cluttered multi-class scene: overlapping ellipses/boxes/stripes of 8
    classes whose colours nearly overlap, plus per-image global colour shift,
    per-region jitter and pixel noise. A supervised model with 2-4 labelled
    images underfits minority classes; the unlabelled set carries the
    class-shape distribution."""
    bg_cls, bg_col = _HARD_CLASSES[0]
    shift = rng.randint(-18, 18, size=3)
    img = np.clip(np.asarray(bg_col) + shift
                  + rng.normal(0, 6, size=(h, w, 3)), 0, 255)
    lab = np.full((h, w), bg_cls, np.uint8)
    for _ in range(rng.randint(18, 28)):
        cls, col = _HARD_CLASSES[rng.randint(1, len(_HARD_CLASSES))]
        kind = rng.randint(3)
        if kind == 0:  # ellipse
            cy, cx = rng.randint(0, h), rng.randint(0, w)
            ry = rng.randint(h // 8 + 1, max(h // 4, h // 8 + 2))
            rx = rng.randint(w // 8 + 1, max(w // 6, w // 8 + 2))
            m = ((ys - cy) / ry) ** 2 + ((xs - cx) / rx) ** 2 <= 1.0
        elif kind == 1:  # box
            y0, x0 = rng.randint(0, max(h - 32, 1)), rng.randint(0, max(w - 32, 1))
            hh = rng.randint(h // 8 + 1, max(h // 3, h // 8 + 2))
            ww = rng.randint(w // 8 + 1, max(w // 4, w // 8 + 2))
            m = (ys >= y0) & (ys < y0 + hh) & (xs >= x0) & (xs < x0 + ww)
        else:  # diagonal stripe
            c = rng.randint(-w, h + w)
            t = rng.randint(12, 50)
            s = rng.choice([-1, 1])
            m = np.abs(ys + s * xs - c) < t
        region_col = (np.asarray(col) + shift
                      + rng.randint(-10, 10, size=3))
        img[m] = np.clip(region_col + rng.normal(0, 6, size=(int(m.sum()), 3)),
                         0, 255)
        lab[m] = cls
    return img.astype(np.uint8), lab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--arch", default="resnet101_deeplab_imagenet")
    ap.add_argument("--out", default=None, help="results root (tmp default)")
    ap.add_argument("--cons_weight", type=float, default=1.0)
    ap.add_argument("--n_sup", type=int, default=8)
    ap.add_argument("--conf_thresh", type=float, default=0.97)
    ap.add_argument("--job_desc", default="run")
    ap.add_argument("--algorithm", default="mask_mt",
                    choices=["mask_mt", "ict", "vat_mt", "aug_mt"])
    ap.add_argument("--task", default="easy", choices=["easy", "hard"],
                    help="'easy' saturates quickly (pipeline exercise); "
                         "'hard' leaves semisup headroom (gain experiments)")
    ap.add_argument("--n_train", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-5,
                    help="paper recipe default; raise for random-init "
                         "convergence experiments")
    ap.add_argument("--rampup", type=int, default=-1)
    ap.add_argument("--checkpoint_interval", type=int, default=10,
                    help="epochs between resume-checkpoint saves (the full "
                         "R101 train state is ~700 MB; per-epoch saves can "
                         "dominate short-epoch wall-clock)")
    args = ap.parse_args()

    tmp = args.out or tempfile.mkdtemp(prefix="tpu_e2e_")
    os.makedirs(tmp, exist_ok=True)
    zip_path = os.path.join(tmp, "cityscapes_segmentation.zip")
    print(f"generating synthetic cityscapes zip at {zip_path}...", flush=True)
    make_zip(zip_path, n_train=args.n_train, task=args.task)

    from cutmix_seg_tpu.core import job
    from cutmix_seg_tpu.data import sources

    orig = sources.CityscapesDataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, with_void=False,
                zip_path_arg=None):
        orig(self, n_val, val_rng, trainval_perm, with_void,
             zip_path_arg or zip_path)

    sources.CityscapesDataSource.__init__ = patched

    p = base_params(
        dataset="cityscapes", arch=args.arch, learning_rate=args.lr,
        crop_size="256,512", cons_weight=args.cons_weight,
        conf_thresh=args.conf_thresh, rampup=args.rampup,
        num_epochs=args.epochs, iters_per_epoch=args.iters,
        batch_size=args.batch_size, n_sup=args.n_sup,
        checkpoint_interval=args.checkpoint_interval,
    )
    if args.algorithm == "mask_mt":
        from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt as fn
    elif args.algorithm == "ict":
        from cutmix_seg_tpu.train.ict import train_seg_semisup_ict as fn
        p.update(ict_alpha=0.1)
        for k in ("mask_mode", "mask_prop_range", "boxmask_n_boxes",
                  "boxmask_fixed_aspect_ratio", "boxmask_by_size",
                  "boxmask_outside_bounds", "boxmask_no_invert"):
            p.pop(k)
    elif args.algorithm == "vat_mt":
        from cutmix_seg_tpu.train.vat_mt import train_seg_semisup_vat_mt as fn
        p.update(vat_radius=0.5, adaptive_vat_radius=True,
                 vat_dir_from_student=False)
        for k in ("mask_mode", "mask_prop_range", "boxmask_n_boxes",
                  "boxmask_fixed_aspect_ratio", "boxmask_by_size",
                  "boxmask_outside_bounds", "boxmask_no_invert"):
            p.pop(k)
    else:
        from cutmix_seg_tpu.train.aug_mt import train_seg_semisup_aug_mt as fn
        p.update(aug_offset_range=16, aug_free_scale_rot=False)
        for k in ("mask_mode", "mask_prop_range", "boxmask_n_boxes",
                  "boxmask_fixed_aspect_ratio", "boxmask_by_size",
                  "boxmask_outside_bounds", "boxmask_no_invert"):
            p.pop(k)
    job.submit("tpu_e2e_cityscapes", args.job_desc, fn, p,
               results_root=os.path.join(tmp, "results"))
    print(f"artifacts in {tmp}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
