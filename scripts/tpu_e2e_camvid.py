"""End-to-end CamVid-format trainer exercise on the default backend.

Generates a synthetic CamVid-format zip at the real frame size (360x480,
``<split>/name.png`` images + ``<split>annot/name.png`` 0..11 label maps —
the on-disk contract of reference: camvid_dataset.py:21-79) and runs the
full mask_mt trainer on it: host decode through the native codec ->
fixed-canvas transfer windows -> ONE fused XLA program per iteration ->
sharded EMA eval with the 11-class void->255 remap. Completes the
per-dataset-family e2e hardware matrix (VOC loose files / Cityscapes zip /
ISIC zip / CamVid zip).

    python scripts/tpu_e2e_camvid.py --epochs 3 --iters 50
"""

import argparse
import io
import os
import sys
import tempfile
import zipfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _e2e_common import base_params  # noqa: E402

# 6 of the 11 CamVid classes with nearly-overlapping colours (class identity
# needs shape+texture) + void regions exercising the 11->255 remap
_CLASSES = [(0, (128, 128, 135)),   # Sky
            (1, (120, 110, 105)),   # Building
            (3, (115, 115, 120)),   # Road
            (5, (105, 125, 110)),   # Tree
            (8, (125, 108, 118)),   # Car
            (9, (135, 120, 112))]   # Pedestrian


def _png(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _scene(rng, h, w, ys, xs):
    bg_cls, bg_col = _CLASSES[0]
    shift = rng.randint(-15, 15, 3)
    img = np.clip(np.asarray(bg_col) + shift + rng.normal(0, 6, (h, w, 3)),
                  0, 255)
    lab = np.full((h, w), bg_cls, np.uint8)
    for _ in range(rng.randint(8, 14)):
        cls, col = _CLASSES[rng.randint(1, len(_CLASSES))]
        if rng.randint(2) == 0:
            cy, cx = rng.randint(0, h), rng.randint(0, w)
            ry = rng.randint(h // 8 + 1, h // 3)
            rx = rng.randint(w // 8 + 1, w // 3)
            m = ((ys - cy) / ry) ** 2 + ((xs - cx) / rx) ** 2 <= 1.0
        else:
            y0, x0 = rng.randint(0, h - 24), rng.randint(0, w - 24)
            m = ((ys >= y0) & (ys < y0 + rng.randint(h // 6, h // 2))
                 & (xs >= x0) & (xs < x0 + rng.randint(w // 6, w // 2)))
        img[m] = np.clip(np.asarray(col) + shift
                         + rng.normal(0, 6, (int(m.sum()), 3)), 0, 255)
        lab[m] = cls
    lab[:4, :] = 11  # void band -> remapped to 255 by the source
    return img.astype(np.uint8), lab


def make_zip(path, n_train=24, n_val=8, n_test=4, hw=(360, 480), seed=0):
    rng = np.random.RandomState(seed)
    h, w = hw
    ys, xs = np.mgrid[0:h, 0:w]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
            for i in range(n):
                img, lab = _scene(rng, h, w, ys, xs)
                zf.writestr(f"camvid/{split}/{split}_{i:04d}.png", _png(img))
                zf.writestr(f"camvid/{split}annot/{split}_{i:04d}.png",
                            _png(lab))
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--arch", default="resnet101_deeplab_imagenet")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cons_weight", type=float, default=1.0)
    ap.add_argument("--n_sup", type=int, default=8)
    ap.add_argument("--conf_thresh", type=float, default=0.97)
    ap.add_argument("--job_desc", default="run")
    ap.add_argument("--n_train", type=int, default=24)
    ap.add_argument("--lr", type=float, default=3e-5)
    ap.add_argument("--rampup", type=int, default=-1)
    ap.add_argument("--checkpoint_interval", type=int, default=10)
    ap.add_argument("--crop_size", default="224,320",
                    help="crop H,W (multiples of the arch block size)")
    args = ap.parse_args()

    tmp = args.out or tempfile.mkdtemp(prefix="tpu_e2e_camvid_")
    os.makedirs(tmp, exist_ok=True)
    zip_path = os.path.join(tmp, "camvid.zip")
    print(f"generating synthetic camvid zip at {zip_path}...", flush=True)
    make_zip(zip_path, n_train=args.n_train)

    from cutmix_seg_tpu.core import job
    from cutmix_seg_tpu.data import sources

    orig = sources.CamVidDataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, zip_path_arg=None):
        orig(self, n_val, val_rng, trainval_perm, zip_path_arg or zip_path)

    sources.CamVidDataSource.__init__ = patched

    p = base_params(
        dataset="camvid", arch=args.arch, learning_rate=args.lr,
        crop_size=args.crop_size, cons_weight=args.cons_weight,
        conf_thresh=args.conf_thresh, rampup=args.rampup,
        num_epochs=args.epochs, iters_per_epoch=args.iters,
        batch_size=args.batch_size, n_sup=args.n_sup,
        checkpoint_interval=args.checkpoint_interval,
    )
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt as fn
    job.submit("tpu_e2e_camvid", args.job_desc, fn, p,
               results_root=os.path.join(tmp, "results"))
    print(f"artifacts in {tmp}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
