"""End-to-end ISIC-2017 recipe exercise at real data scale on the default backend.

Generates a synthetic ISIC-format zip at the converter's real output
resolution (248x248 `{split}/{name}_x.png/_y.png` pairs + rgb_mean_std.pkl;
reference: convert_isic.py:7-102) and runs the full mask_mt trainer with the
paper's ISIC recipe shape — DenseUNet-161, crop 224^2, SGD lr 0.1 wd 5e-4
poly, h/v/hv flips, scale 1.1, rotation 45 deg, strong colour, CutMix
mean-teacher, binary hole-filling eval
(reference: run_isic2017_experiments.sh:14-31).

    python scripts/tpu_e2e_isic.py --epochs 3 --iters 40
    python scripts/tpu_e2e_isic.py --cons_weight 0 --job_desc supervised
"""

import argparse
import io
import os
import pickle
import sys
import tempfile
import zipfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _e2e_common import base_params  # noqa: E402


def _png(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _lesion_scene(rng, h, w, ys, xs, task="easy"):
    """Skin-toned background with hair-like stripe distractors and an
    irregular multi-lobe lesion whose colour overlaps the distractors —
    segmenting it needs shape, not a colour threshold, leaving semisup
    headroom at small n_sup. ``task='hard'``: fainter, smaller lesions,
    heavier hair clutter, larger appearance variation (more headroom for
    the consistency signal)."""
    hard = task == "hard"
    skin = np.array([205, 160, 140]) + rng.randint(-15, 15, 3)
    grad = (ys / h - 0.5)[:, :, None] * rng.randint(-25, 25, 3)
    img = np.clip(skin + grad + rng.normal(0, 5, (h, w, 3)), 0, 255)
    # hair distractors: thin dark diagonal strokes
    for _ in range(rng.randint(*((10, 20) if hard else (4, 10)))):
        c = rng.randint(-w, h + w)
        s = rng.choice([-1, 1])
        m = np.abs(ys + s * xs - c) < rng.randint(1, 3)
        img[m] = img[m] * (0.55 if hard else 0.45)
    # lesion: union of 2-4 overlapping ellipses with wavy boundaries
    lab = np.zeros((h, w), bool)
    cy0, cx0 = rng.randint(h // 3, 2 * h // 3), rng.randint(w // 3, 2 * w // 3)
    for _ in range(rng.randint(2, 5)):
        cy = cy0 + rng.randint(-h // 8, h // 8)
        cx = cx0 + rng.randint(-w // 8, w // 8)
        if hard:  # smaller lobes
            ry = rng.randint(h // 14, h // 8)
            rx = rng.randint(w // 14, w // 8)
        else:
            ry = rng.randint(h // 10, h // 5)
            rx = rng.randint(w // 10, w // 5)
        ang = rng.uniform(0, np.pi)
        yr = (ys - cy) * np.cos(ang) + (xs - cx) * np.sin(ang)
        xr = -(ys - cy) * np.sin(ang) + (xs - cx) * np.cos(ang)
        wave = 1.0 + 0.25 * np.sin(np.arctan2(yr, xr) * rng.randint(3, 7))
        lab |= (yr / ry) ** 2 + (xr / rx) ** 2 <= wave
    if hard:
        # faint lesion whose tone varies per image and overlaps hair tone
        lesion_col = skin * 0.75 + rng.randint(-18, 18, 3)
        alpha = 0.30 + 0.25 * rng.rand(h, w, 1)
    else:
        lesion_col = np.array([120, 75, 70]) + rng.randint(-20, 20, 3)
        alpha = 0.75 + 0.2 * rng.rand(h, w, 1)
    img = np.where(lab[:, :, None],
                   img * (1 - alpha) + (lesion_col
                                        + rng.normal(0, 8, (h, w, 3))) * alpha,
                   img)
    return (np.clip(img, 0, 255).astype(np.uint8),
            np.where(lab, 255, 0).astype(np.uint8))


def make_zip(path, n_train=40, n_val=10, hw=(248, 248), seed=0, task="easy"):
    rng = np.random.RandomState(seed)
    h, w = hw
    ys, xs = np.mgrid[0:h, 0:w]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        for split, n in (("train", n_train), ("val", n_val)):
            for i in range(n):
                img, lab = _lesion_scene(rng, h, w, ys, xs, task=task)
                zf.writestr(f"{split}/im{i:03d}_x.png", _png(img))
                zf.writestr(f"{split}/im{i:03d}_y.png", _png(lab))
        zf.writestr("rgb_mean_std.pkl", pickle.dumps(
            {"rgb_mean": np.full(3, 0.6), "rgb_std": np.full(3, 0.2)}))
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=10)
    ap.add_argument("--arch", default="densenet161unet_imagenet")
    ap.add_argument("--out", default=None, help="results root (tmp default)")
    ap.add_argument("--cons_weight", type=float, default=1.0)
    ap.add_argument("--n_sup", type=int, default=6)
    ap.add_argument("--n_train", type=int, default=40)
    ap.add_argument("--conf_thresh", type=float, default=0.97)
    ap.add_argument("--job_desc", default="run")
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--rampup", type=int, default=-1)
    ap.add_argument("--task", default="easy", choices=["easy", "hard"],
                    help="'easy' saturates quickly (pipeline exercise); "
                         "'hard' leaves semisup headroom (gain experiments)")
    ap.add_argument("--checkpoint_interval", type=int, default=10,
                    help="epochs between resume-checkpoint saves (the full "
                         "train state is large; per-epoch saves can "
                         "dominate short-epoch wall-clock)")
    args = ap.parse_args()

    tmp = args.out or tempfile.mkdtemp(prefix="tpu_e2e_isic_")
    os.makedirs(tmp, exist_ok=True)
    zip_path = os.path.join(tmp, "isic2017_segmentation.zip")
    print(f"generating synthetic ISIC zip at {zip_path}...", flush=True)
    make_zip(zip_path, n_train=args.n_train, task=args.task)

    from cutmix_seg_tpu.core import job
    from cutmix_seg_tpu.data import sources

    orig = sources.ISIC2017DataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, zip_path_arg=None):
        orig(self, n_val, val_rng, trainval_perm, zip_path_arg or zip_path)

    sources.ISIC2017DataSource.__init__ = patched

    # the paper ISIC recipe (run_isic2017_experiments.sh:14-15,22) with
    # no_pretrained for the synthetic task
    p = base_params(
        dataset="isic2017", arch=args.arch, freeze_bn=False, opt_type="sgd",
        learning_rate=args.lr, lr_sched="poly", bin_fill_holes=True,
        crop_size="224,224", aug_vflip=True, aug_hvflip=True,
        aug_max_scale=1.1, aug_rot_mag=45.0,
        cons_weight=args.cons_weight, conf_thresh=args.conf_thresh,
        rampup=args.rampup, num_epochs=args.epochs,
        iters_per_epoch=args.iters, batch_size=args.batch_size,
        n_sup=args.n_sup, checkpoint_interval=args.checkpoint_interval,
    )
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt as fn
    job.submit("tpu_e2e_isic", args.job_desc, fn, p,
               results_root=os.path.join(tmp, "results"))
    print(f"artifacts in {tmp}", flush=True)


if __name__ == "__main__":
    main()
