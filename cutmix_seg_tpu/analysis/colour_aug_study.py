"""Colour-augmentation study (script equivalent of the reference's
'Colour augmentation.ipynb').

Visualises what the strong-colour augmentation does to images and to the
input distribution: a grid of jittered variants of sample images, and per
channel value histograms before/after augmentation. Runs the same on-device
colour pipeline the trainers use (ops.colour), so what you see is what the
student trains on.
"""

from __future__ import annotations

import os

import click
import jax
import jax.numpy as jnp
import numpy as np

from cutmix_seg_tpu.data import datasets
from cutmix_seg_tpu.ops.colour import ColourJitterConfig, colour_jitter


@click.command()
@click.argument("out_dir", type=click.Path())
@click.option("--dataset", type=click.Choice(
    ["camvid", "cityscapes", "pascal", "pascal_aug", "isic2017"]),
    default="pascal_aug")
@click.option("--n_images", type=int, default=4)
@click.option("--n_variants", type=int, default=6)
@click.option("--brightness", type=float, default=0.4)
@click.option("--contrast", type=float, default=0.4)
@click.option("--saturation", type=float, default=0.4)
@click.option("--hue", type=float, default=0.1)
@click.option("--seed", type=int, default=0)
def main(out_dir, dataset, n_images, n_variants, brightness, contrast,
         saturation, hue, seed):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    ds = datasets.load_dataset(dataset, n_val=-1, val_seed=131, n_sup=-1,
                               n_unsup=-1, split_seed=12345,
                               split_path=None)["ds_src"]
    cfg = ColourJitterConfig(brightness=brightness, contrast=contrast,
                             saturation=saturation, hue=hue,
                             apply_prob=1.0, greyscale_prob=0.2)
    rng = np.random.RandomState(seed)
    picks = rng.choice(ds.train_ndx, size=n_images, replace=False)

    fig, axes = plt.subplots(n_images, n_variants + 1,
                             figsize=(2.2 * (n_variants + 1), 2.2 * n_images))
    key = jax.random.PRNGKey(seed)
    originals, augmented = [], []
    for r, idx in enumerate(picks):
        img = ds.get_image(int(idx)).astype(np.float32) / 255.0
        h = (img.shape[0] // 8) * 8
        w = (img.shape[1] // 8) * 8
        img = img[:h, :w]
        originals.append(img)
        axes[r, 0].imshow(img)
        axes[r, 0].set_title("original" if r == 0 else "")
        axes[r, 0].axis("off")
        for v in range(n_variants):
            key, k = jax.random.split(key)
            out = np.asarray(colour_jitter(jnp.asarray(img[None]), k, cfg)[0])
            augmented.append(out)
            axes[r, v + 1].imshow(out)
            axes[r, v + 1].axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "colour_aug_grid.png"), dpi=120)
    plt.close(fig)

    # channel histograms before/after
    fig, axes = plt.subplots(1, 3, figsize=(12, 3))
    orig_px = np.concatenate([o.reshape(-1, 3) for o in originals])
    aug_px = np.concatenate([a.reshape(-1, 3) for a in augmented])
    for c, name in enumerate("RGB"):
        axes[c].hist(orig_px[:, c], bins=50, alpha=0.5, label="original",
                     density=True)
        axes[c].hist(aug_px[:, c], bins=50, alpha=0.5, label="augmented",
                     density=True)
        axes[c].set_title(name)
        axes[c].legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "colour_aug_histograms.png"), dpi=120)
    print(f"Wrote colour_aug_grid.png and colour_aug_histograms.png to {out_dir}")


if __name__ == "__main__":
    main()
