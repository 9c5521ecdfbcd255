"""End-to-end Pascal-VOC headline recipe at real data scale on the default backend.

Generates a synthetic loose-file VOC2012 tree (variable-size JPEG images up
to 500x375 under JPEGImages/, palette-style PNG labels, ImageSets name
lists — the reference's on-disk contract) and runs the FULL mask_mt trainer
with the paper's headline Pascal configuration — DeepLab v2 R101, crop
321^2, batch 10, Adam 3e-5, h-flip + Hung crop-scale + strong colour,
CutMix mean-teacher cw=1.0 conf=0.97
(reference: run_pascal_aug_experiments.sh:14-31).

Exercises the loose-file data path on hardware end-to-end: per-image
variable sizes on fixed canvases, host->device transfer windows, JPEG decode
through the native codec, ONE fused XLA program per iteration.

    python scripts/tpu_e2e_voc.py --epochs 2 --iters 30
    python scripts/tpu_e2e_voc.py --cons_weight 0 --job_desc supervised
"""

import argparse
import os
import sys
import tempfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _e2e_common import base_params  # noqa: E402

# nearly-overlapping region colours: class identity needs shape+texture
_CLASSES = [(0, (110, 112, 108)), (5, (125, 108, 118)), (9, (104, 124, 116)),
            (12, (122, 122, 104)), (15, (108, 108, 128))]


def _scene(rng, h, w, ys, xs):
    bg_cls, bg_col = _CLASSES[0]
    shift = rng.randint(-15, 15, 3)
    img = np.clip(np.asarray(bg_col) + shift + rng.normal(0, 6, (h, w, 3)),
                  0, 255)
    lab = np.full((h, w), bg_cls, np.uint8)
    for _ in range(rng.randint(6, 12)):
        cls, col = _CLASSES[rng.randint(1, len(_CLASSES))]
        kind = rng.randint(2)
        if kind == 0:
            cy, cx = rng.randint(0, h), rng.randint(0, w)
            ry = rng.randint(h // 8 + 1, h // 3)
            rx = rng.randint(w // 8 + 1, w // 3)
            m = ((ys - cy) / ry) ** 2 + ((xs - cx) / rx) ** 2 <= 1.0
        else:
            y0, x0 = rng.randint(0, max(h - 24, 1)), rng.randint(0, max(w - 24, 1))
            m = ((ys >= y0) & (ys < y0 + rng.randint(h // 6, h // 2))
                 & (xs >= x0) & (xs < x0 + rng.randint(w // 6, w // 2)))
        img[m] = np.clip(np.asarray(col) + shift
                         + rng.normal(0, 6, (int(m.sum()), 3)), 0, 255)
        lab[m] = cls
    # VOC-style 255 boundary band around one region edge
    lab[:2, :] = 255
    return img.astype(np.uint8), lab


def make_voc_tree(root, n_train=24, n_val=8, seed=0):
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "SegmentationClass"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Segmentation"), exist_ok=True)
    rng = np.random.RandomState(seed)
    names = [f"2007_{i:06d}" for i in range(n_train + n_val)]
    for name in names:
        # real VOC size spread: long side 500, short side 300-400ish
        if rng.rand() < 0.5:
            h, w = int(rng.randint(300, 400)), 500
        else:
            h, w = 500, int(rng.randint(300, 400))
        ys, xs = np.mgrid[0:h, 0:w]
        img, lab = _scene(rng, h, w, ys, xs)
        Image.fromarray(img).save(
            os.path.join(root, "JPEGImages", f"{name}.jpg"), quality=92)
        Image.fromarray(lab).save(
            os.path.join(root, "SegmentationClass", f"{name}.png"))
    with open(os.path.join(root, "ImageSets", "Segmentation", "train.txt"),
              "w") as f:
        f.write("\n".join(names[:n_train]) + "\n")
    with open(os.path.join(root, "ImageSets", "Segmentation", "val.txt"),
              "w") as f:
        f.write("\n".join(names[n_train:]) + "\n")
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=10)
    ap.add_argument("--arch", default="resnet101_deeplab_imagenet")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cons_weight", type=float, default=1.0)
    ap.add_argument("--n_sup", type=int, default=6)
    ap.add_argument("--conf_thresh", type=float, default=0.8)
    ap.add_argument("--job_desc", default="run")
    ap.add_argument("--lr", type=float, default=3e-5)
    ap.add_argument("--rampup", type=int, default=-1,
                    help="sigmoid ramp of the consistency weight over this "
                         "many epochs — the supervised warm-start phase the "
                         "random-init recipe needs (reference --rampup flag)")
    ap.add_argument("--n_train", type=int, default=24)
    ap.add_argument("--checkpoint_interval", type=int, default=10,
                    help="epochs between resume-checkpoint saves (the full "
                         "R101 train state is ~700 MB; per-epoch saves can "
                         "dominate short-epoch wall-clock)")
    ap.add_argument("--resume", action="store_true", default=False,
                    help="resume from the latest checkpoint in this "
                         "job_desc's run dir (engine --resume semantics)")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (init + host streams + masks); the "
                         "synthetic dataset tree stays fixed so seeds vary "
                         "only the training randomness, matching the "
                         "reference's multi-seed protocol "
                         "(run_cityscapes_experiments.sh:14-17)")
    args = ap.parse_args()

    tmp = args.out or tempfile.mkdtemp(prefix="tpu_e2e_voc_")
    root = os.path.join(tmp, "VOC2012")
    print(f"generating synthetic VOC tree at {root}...", flush=True)
    make_voc_tree(root, n_train=args.n_train)

    from cutmix_seg_tpu.core import job
    from cutmix_seg_tpu.data import sources

    orig = sources.PascalVOCDataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, augmented=False,
                fg_class_subset=None, root_arg=None):
        orig(self, n_val, val_rng, trainval_perm, False, fg_class_subset,
             root_arg or root)

    sources.PascalVOCDataSource.__init__ = patched

    # the paper headline recipe (run_pascal_aug_experiments.sh:14-31) with
    # no_pretrained for the synthetic task; dataset='pascal' (plain label
    # dir; the synthetic tree has no SBD aug labels)
    p = base_params(
        dataset="pascal", arch=args.arch, learning_rate=args.lr,
        crop_size="321,321", aug_scale_hung=True,
        cons_weight=args.cons_weight, conf_thresh=args.conf_thresh,
        rampup=args.rampup, num_epochs=args.epochs,
        iters_per_epoch=args.iters, batch_size=args.batch_size,
        n_sup=args.n_sup, resume=args.resume,
        checkpoint_interval=args.checkpoint_interval, seed=args.seed,
    )
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt as fn
    job.submit("tpu_e2e_voc", args.job_desc, fn, p,
               results_root=os.path.join(tmp, "results"))
    print(f"artifacts in {tmp}", flush=True)


if __name__ == "__main__":
    main()
