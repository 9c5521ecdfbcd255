"""Toy-2D subsystem tests: dataset generation, renders, and a short
end-to-end training run whose error rate must beat chance."""

import numpy as np
import pytest

from cutmix_seg_tpu.core import job
from cutmix_seg_tpu.toy2d import data as toy_data


def test_spiral_dataset_shapes():
    rng = np.random.RandomState(0)
    ds = toy_data.spiral_classification_dataset(10, False, rng, N=500)
    assert ds.X.shape == (1000, 2)
    assert len(ds.sup_X) == 10
    assert len(ds.unsup_X) == 1000
    assert set(np.unique(ds.sup_y)).issubset({0, 1})
    # points roughly inside [-1.2, 1.2]
    assert np.abs(ds.X).max() < 1.3


def test_spiral_balanced_split():
    rng = np.random.RandomState(1)
    ds = toy_data.spiral_classification_dataset(10, True, rng, N=500)
    assert (ds.sup_y == 0).sum() == 5 and (ds.sup_y == 1).sum() == 5


def test_image_dataset_and_distance_map(tmp_path):
    from PIL import Image

    img = np.zeros((64, 64), np.uint8)
    img[:, 32:] = 255
    path = tmp_path / "halves.png"
    Image.fromarray(img).save(path)
    rng = np.random.RandomState(2)
    ds = toy_data.classification_dataset_from_image(
        str(path), region_erode_radius=4, img_noise_std=0.5, n_sup=6,
        balance_classes=True, rng=rng)
    assert ds.image.shape == (64, 64)
    assert ds.image_edges is not None
    # class-1 points cluster on the right half
    cls1 = ds.X[ds.y == 1]
    assert (cls1[:, 1] > 0).mean() > 0.9


def test_crosshatch_dataset():
    rng = np.random.RandomState(3)
    ds = toy_data.crosshatch_classification_dataset(rng, grid_size=4,
                                                    points_per_cell=8)
    assert len(ds.sup_X) == 2


def test_render_plot():
    rng = np.random.RandomState(4)
    ds = toy_data.spiral_classification_dataset(10, False, rng, N=200)
    pred = rng.uniform(size=(256 * 256,))
    img = ds.semisup_image_plot(pred)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8


def test_toy2d_training_end_to_end(tmp_path):
    from cutmix_seg_tpu.toy2d.train import train_toy2d

    params = dict(
        dataset="spiral", region_erode_radius=0, img_noise_std=2.0,
        n_sup=30, balance_classes=True, seed=0, sup_path=None,
        model="mean_teacher", n_hidden=2, hidden_size=64, hidden_act="relu",
        norm_layer="batch_norm", perturb_noise_std="6.0",
        dist_contour_range=0.0, conf_thresh=0.5, conf_avg=False,
        cons_weight=1.0, cons_loss_fn="var", cons_no_dropout=False,
        learning_rate=2e-3, teacher_alpha=0.9, num_epochs=4, batch_size=256,
        render_cons_grad=False, render_pred="prob", save_output=True,
    )
    err = job.submit("toy2d_test", "run1", train_toy2d, params,
                     results_root=str(tmp_path / "results"))
    assert err is not None and err < 0.45  # learns something beyond chance
    run_dir = tmp_path / "results" / "toy2d_test" / "run1"
    assert (run_dir / "epoch_00000.png").exists()
    assert (run_dir / "epoch_00004.png").exists()
    log = (run_dir / "log_run1.txt").read_text()
    assert "FINAL RESULT: Error rate=" in log


@pytest.mark.slow  # quick bar: the mean-teacher e2e covers the trainer path
@pytest.mark.parametrize("model", ["pi", "pi_onebatch"])
def test_toy2d_pi_variants(tmp_path, model):
    from cutmix_seg_tpu.toy2d.train import train_toy2d

    params = dict(
        dataset="spiral", region_erode_radius=0, img_noise_std=2.0,
        n_sup=20, balance_classes=False, seed=1, sup_path=None,
        model=model, n_hidden=1, hidden_size=32, hidden_act="lrelu",
        norm_layer="none", perturb_noise_std="6.0", dist_contour_range=0.0,
        conf_thresh=0.0, conf_avg=True, cons_weight=1.0, cons_loss_fn="bce",
        cons_no_dropout=True, learning_rate=2e-3, teacher_alpha=0.99,
        num_epochs=1, batch_size=128, render_cons_grad=True,
        render_pred="class", save_output=True,
    )
    err = job.submit(f"toy2d_{model}", "r", train_toy2d, params,
                     results_root=str(tmp_path / "results"))
    assert err is not None and np.isfinite(err)
