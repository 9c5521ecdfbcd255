"""End-to-end smoke test of the mask_mt trainer: synthetic Cityscapes-format
zip, tiny DeepLab, 2 epochs x 3 iters on the CPU mesh — exercises the full
path: splits -> host loader -> device augmentation -> fused train step ->
EMA eval -> IoU -> logging -> checkpoint -> resume."""

import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from cutmix_seg_tpu.core import job
from cutmix_seg_tpu.models import registry
from cutmix_seg_tpu.models.common import SegModel
from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label


pytestmark = pytest.mark.slow  # full e2e runs; quick bar: -m "not slow"

def _png_bytes(arr):
    import io

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def build_tiny_zip(path) -> str:
    """Synthetic Cityscapes-format zip (plain function: also used by the
    standalone preemption child, tests/_preempt_child.py)."""
    rng = np.random.RandomState(0)
    with zipfile.ZipFile(path, "w") as zf:
        for split, n in (("train", 8), ("val", 2)):
            for i in range(n):
                img = rng.randint(0, 255, size=(48, 48, 3), dtype=np.uint8)
                lab = rng.randint(7, 9, size=(48, 48), dtype=np.uint8)  # road/sidewalk
                zf.writestr(f"{split}/s{i}_x.png", _png_bytes(img))
                zf.writestr(f"{split}/s{i}_y.png", _png_bytes(lab))
    return str(path)


def register_tiny_arch(name: str = "tiny_deeplab_test") -> str:
    if name not in registry.names():
        @registry.register(name)
        def factory(num_classes, dtype=None, pretrained=True):
            return SegModel(
                name=name,
                module=DeepLab2(num_classes=num_classes, layers=(1, 1, 1, 1),
                                dtype=dtype),
                mean=np.zeros(3),
                std=np.ones(3),
                block_size=(1, 1),
                param_label=_param_label,
            )
    return name


@pytest.fixture
def tiny_zip(tmp_path):
    return build_tiny_zip(tmp_path / "cityscapes_segmentation.zip")


@pytest.fixture(autouse=True)
def tiny_arch():
    return register_tiny_arch()


def _params(tiny_zip, **overrides):
    p = dict(
        dataset="cityscapes", model="mean_teacher", arch="tiny_deeplab_test",
        freeze_bn=True, opt_type="adam", sgd_momentum=0.9, sgd_nesterov=False,
        sgd_weight_decay=5e-4, learning_rate=1e-3, lr_sched="none",
        lr_step_epochs="", lr_step_gamma=0.1, lr_poly_power=0.9,
        teacher_alpha=0.9, bin_fill_holes=False, crop_size="32,32",
        aug_hflip=True, aug_vflip=False, aug_hvflip=False,
        aug_scale_hung=False, aug_max_scale=1.0, aug_scale_non_uniform=False,
        aug_rot_mag=0.0, aug_strong_colour=True, aug_colour_brightness=0.4,
        aug_colour_contrast=0.4, aug_colour_saturation=0.4,
        aug_colour_hue=0.1, aug_colour_prob=0.8,
        aug_colour_greyscale_prob=0.2, mask_mode="mix", mask_prop_range="0.5",
        boxmask_n_boxes=1, boxmask_fixed_aspect_ratio=False,
        boxmask_by_size=False, boxmask_outside_bounds=False,
        boxmask_no_invert=False, cons_loss_fn="var", cons_weight=1.0,
        conf_thresh=0.0, conf_per_pixel=False, rampup=-1,
        unsup_batch_ratio=1, num_epochs=2, iters_per_epoch=3, batch_size=2,
        n_sup=4, n_unsup=-1, n_val=-1, split_seed=12345, split_path=None,
        val_seed=131, save_preds=False, save_model=True, num_workers=2,
        compute_dtype="float32", n_devices=2, resume=False,
        nan_check_interval=1, seed=0,
    )
    p.update(overrides)
    return p


def _patch_zip(monkeypatch, tiny_zip):
    from cutmix_seg_tpu.data import sources

    orig = sources.CityscapesDataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, with_void=False, zip_path=None):
        orig(self, n_val, val_rng, trainval_perm, with_void, zip_path or tiny_zip)

    monkeypatch.setattr(sources.CityscapesDataSource, "__init__", patched)


def test_mask_mt_trainer_end_to_end(tiny_zip, tmp_path, monkeypatch):
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    result = job.submit(
        "test_mask_mt", "run1", train_seg_semisup_mask_mt,
        _params(tiny_zip), results_root=str(tmp_path / "results"))

    run_dir = tmp_path / "results" / "test_mask_mt" / "run1"
    log = (run_dir / "log_run1.txt").read_text()
    assert "Epoch 1:" in log and "Epoch 2:" in log
    assert "VAL mIoU=" in log
    assert (run_dir / "metrics_run1.jsonl").exists()
    assert (run_dir / "model.msgpack").exists()
    ckpts = os.listdir(run_dir / "checkpoints")
    assert any(c.startswith("ckpt_") for c in ckpts)

    # duplicate-job skip (reference: job_helper.py:55-56,131-132)
    sentinel = job.submit(
        "test_mask_mt", "run1", train_seg_semisup_mask_mt,
        _params(tiny_zip), results_root=str(tmp_path / "results"))
    assert sentinel is None


def test_mask_mt_trainer_resume(tiny_zip, tmp_path, monkeypatch):
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    root = str(tmp_path / "results")
    job.submit("test_resume", "a", train_seg_semisup_mask_mt,
               _params(tiny_zip, num_epochs=1), results_root=root)
    # second run resumes from the epoch-1 checkpoint and continues to epoch 2
    job.submit("test_resume", "b", train_seg_semisup_mask_mt,
               _params(tiny_zip, num_epochs=2, resume=True), results_root=root,
               skip_if_log_exists=False)
    # note: different desc -> different checkpoint dir, so this just verifies
    # the resume path runs cleanly from scratch
    log = (tmp_path / "results" / "test_resume" / "b" / "log_b.txt").read_text()
    assert "Epoch 2:" in log


def test_checkpoint_interval_amortises_saves(tiny_zip, tmp_path, monkeypatch):
    """checkpoint_interval=N saves every Nth epoch plus the final epoch —
    the full train state is ~700 MB at R101 scale, so per-epoch saves can
    dominate short-epoch wall-clock (measured ~45 s/epoch on the bench
    host)."""
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    job.submit(
        "test_ckpt_interval", "run1", train_seg_semisup_mask_mt,
        _params(tiny_zip, num_epochs=3, checkpoint_interval=2,
                save_model=False),
        results_root=str(tmp_path / "results"))
    run_dir = tmp_path / "results" / "test_ckpt_interval" / "run1"
    log = (run_dir / "log_run1.txt").read_text()
    assert "Epoch 3:" in log
    ckpts = sorted(os.listdir(run_dir / "checkpoints"))
    # epoch 2 (step 6) and the always-saved final epoch 3 (step 9)
    assert ckpts == ["ckpt_000000006.msgpack", "ckpt_000000009.msgpack"], ckpts


def test_mask_mt_trainer_cutout_pi(tiny_zip, tmp_path, monkeypatch):
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    job.submit(
        "test_cutout", "run1", train_seg_semisup_mask_mt,
        _params(tiny_zip, mask_mode="zero", model="pi", num_epochs=1,
                aug_strong_colour=False),
        results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / "test_cutout" / "run1" / "log_run1.txt").read_text()
    assert "Epoch 1:" in log


def _strip_mask_params(p):
    for k in list(p):
        if k.startswith("mask_") or k.startswith("boxmask_"):
            del p[k]
    return p


def test_ict_trainer_end_to_end(tiny_zip, tmp_path, monkeypatch):
    from cutmix_seg_tpu.train.ict import train_seg_semisup_ict

    _patch_zip(monkeypatch, tiny_zip)
    p = _strip_mask_params(_params(tiny_zip, num_epochs=1))
    p["ict_alpha"] = 0.1
    job.submit("test_ict", "run1", train_seg_semisup_ict, p,
               results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / "test_ict" / "run1" / "log_run1.txt").read_text()
    assert "Epoch 1:" in log and "VAL mIoU=" in log


def test_vat_trainer_end_to_end(tiny_zip, tmp_path, monkeypatch):
    from cutmix_seg_tpu.train.vat_mt import train_seg_semisup_vat_mt

    _patch_zip(monkeypatch, tiny_zip)
    p = _strip_mask_params(_params(tiny_zip, num_epochs=1,
                                   aug_strong_colour=False))
    p.update(vat_radius=0.5, adaptive_vat_radius=True,
             vat_dir_from_student=False)
    job.submit("test_vat", "run1", train_seg_semisup_vat_mt, p,
               results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / "test_vat" / "run1" / "log_run1.txt").read_text()
    assert "Epoch 1:" in log and "VAL mIoU=" in log


def test_aug_mt_trainer_end_to_end(tiny_zip, tmp_path, monkeypatch):
    from cutmix_seg_tpu.train.aug_mt import train_seg_semisup_aug_mt

    _patch_zip(monkeypatch, tiny_zip)
    p = _strip_mask_params(_params(tiny_zip, num_epochs=1,
                                   aug_scale_hung=True))
    p.update(aug_offset_range=8.0, aug_free_scale_rot=False)
    job.submit("test_aug", "run1", train_seg_semisup_aug_mt, p,
               results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / "test_aug" / "run1" / "log_run1.txt").read_text()
    assert "Epoch 1:" in log and "VAL mIoU=" in log


def test_cli_surfaces():
    """The four CLIs must expose the reference flag surface."""
    from click.testing import CliRunner

    from cutmix_seg_tpu.train import aug_mt, ict, mask_mt, vat_mt

    runner = CliRunner()
    for mod, extra in (
        (mask_mt, "--mask_mode"),
        (ict, "--ict_alpha"),
        (vat_mt, "--vat_radius"),
        (aug_mt, "--aug_offset_range"),
    ):
        res = runner.invoke(mod.experiment, ["--help"])
        assert res.exit_code == 0
        assert extra in res.output
        for flag in ("--dataset", "--arch", "--cons_loss_fn", "--conf_thresh",
                     "--teacher_alpha", "--split_seed", "--n_sup"):
            assert flag in res.output, (mod.__name__, flag)


def test_multi_seed_trainer_end_to_end(tiny_zip, tmp_path, monkeypatch):
    from cutmix_seg_tpu.train.multi_seed_mask_mt import (
        train_seg_semisup_mask_mt_multiseed)

    _patch_zip(monkeypatch, tiny_zip)
    p = _params(tiny_zip, num_epochs=1, aug_strong_colour=False)
    del p["n_devices"]
    p["parallel_split_seeds"] = "12345,23456"
    job.submit("test_mseed", "run1", train_seg_semisup_mask_mt_multiseed, p,
               results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / "test_mseed" / "run1" / "log_run1.txt").read_text()
    assert "[seed 12345]" in log and "[seed 23456]" in log
    assert log.count("VAL mIoU=") == 2


@pytest.fixture
def isic_zip(tmp_path):
    """Tiny ISIC-2017-format zip: {split}/{name}_x.png/_y.png + rgb stats."""
    import io as _io
    import pickle as _pickle

    rng = np.random.RandomState(3)
    path = tmp_path / "isic2017_segmentation.zip"
    with zipfile.ZipFile(path, "w") as zf:
        for split, n in (("train", 8), ("val", 4)):
            for i in range(n):
                img = rng.randint(0, 255, size=(48, 48, 3), dtype=np.uint8)
                lab = np.zeros((48, 48), np.uint8)
                cy, cx, r = rng.randint(14, 34), rng.randint(14, 34), 10
                ys, xs = np.mgrid[0:48, 0:48]
                lab[(ys - cy) ** 2 + (xs - cx) ** 2 <= r * r] = 255
                img[lab == 255] = (img[lab == 255] // 2) + 90  # visible lesion
                zf.writestr(f"{split}/im{i}_x.png", _png_bytes(img))
                zf.writestr(f"{split}/im{i}_y.png", _png_bytes(lab))
        zf.writestr("rgb_mean_std.pkl", _pickle.dumps(
            {"rgb_mean": np.full(3, 0.5), "rgb_std": np.full(3, 0.25)}))
    return str(path)


def test_isic_recipe_trainer_end_to_end(isic_zip, tmp_path, monkeypatch):
    """The ISIC recipe shape end-to-end: ISIC-format zip source, 2-class
    labels (img>=127), dataset RGB stats, SGD+poly LR, h/v flips, and the
    binary-hole-filling eval path (reference: run_isic2017_experiments.sh)."""
    from cutmix_seg_tpu.data import sources
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    orig = sources.ISIC2017DataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, zip_path=None):
        orig(self, n_val, val_rng, trainval_perm, zip_path or isic_zip)

    monkeypatch.setattr(sources.ISIC2017DataSource, "__init__", patched)
    monkeypatch.setattr(sources.ISIC2017DataSource, "canvas_hw", (48, 48))

    p = _params(
        isic_zip, dataset="isic2017", bin_fill_holes=True, opt_type="sgd",
        learning_rate=0.1, sgd_weight_decay=5e-4, lr_sched="poly",
        lr_poly_power=0.9, crop_size="32,32", aug_hflip=True, aug_vflip=True,
        aug_hvflip=True, aug_strong_colour=False, num_epochs=1,
        iters_per_epoch=3, batch_size=2, n_sup=4, conf_thresh=0.5)
    job.submit("test_isic", "r", train_seg_semisup_mask_mt, p,
               results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / "test_isic" / "r" / "log_r.txt").read_text()
    assert "VAL mIoU=" in log
    assert "FINAL TEST" not in log  # ISIC zip fixture has no test split


def test_pascal_voc_recipe_trainer_end_to_end(tmp_path, monkeypatch):
    """The Pascal recipe shape end-to-end: loose-file VOC source through the
    engine (variable image sizes on canvases, n_sup head of the train perm,
    strong colour pair) — the file-based data path the other e2e tests don't
    touch (reference: run_pascal_aug_experiments.sh)."""
    from PIL import Image as _Image

    from cutmix_seg_tpu.data import sources
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    rng = np.random.RandomState(4)
    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    names = [f"img{i:03d}" for i in range(10)]
    for k, name in enumerate(names):
        h, w = rng.randint(36, 49), rng.randint(36, 49)  # variable sizes
        img = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
        _Image.fromarray(img).save(root / "JPEGImages" / f"{name}.jpg")
        lab = rng.randint(0, 4, size=(h, w)).astype(np.uint8)
        _Image.fromarray(lab).save(root / "SegmentationClass" / f"{name}.png")
    with open(root / "ImageSets" / "Segmentation" / "train.txt", "w") as f:
        f.write("\n".join(names[:8]) + "\n")
    with open(root / "ImageSets" / "Segmentation" / "val.txt", "w") as f:
        f.write("\n".join(names[8:]) + "\n")

    orig = sources.PascalVOCDataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, augmented=False,
                fg_class_subset=None, root_arg=None):
        orig(self, n_val, val_rng, trainval_perm, augmented, fg_class_subset,
             root_arg or str(root))

    monkeypatch.setattr(sources.PascalVOCDataSource, "__init__", patched)
    monkeypatch.setattr(sources.PascalVOCDataSource, "canvas_hw", (48, 48))

    p = _params(
        None, dataset="pascal", crop_size="32,32", num_epochs=1,
        iters_per_epoch=3, batch_size=2, n_sup=4, conf_thresh=0.5)
    job.submit("test_voc", "r", train_seg_semisup_mask_mt, p,
               results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / "test_voc" / "r" / "log_r.txt").read_text()
    assert "VAL mIoU=" in log
    assert "len(sup_ndx)=4" in log


@pytest.fixture
def camvid_zip(tmp_path):
    """Tiny CamVid-format zip: {split}/{name}.png + {split}annot/{name}.png."""
    rng = np.random.RandomState(5)
    path = tmp_path / "camvid_segmentation.zip"
    with zipfile.ZipFile(path, "w") as zf:
        for split, n in (("train", 8), ("val", 2), ("test", 2)):
            for i in range(n):
                img = rng.randint(0, 255, size=(48, 48, 3), dtype=np.uint8)
                lab = rng.randint(0, 12, size=(48, 48), dtype=np.uint8)  # 11=void
                zf.writestr(f"{split}/f{split[0]}{i}.png", _png_bytes(img))
                zf.writestr(f"{split}annot/f{split[0]}{i}.png", _png_bytes(lab))
    return str(path)


def test_camvid_trainer_end_to_end(camvid_zip, tmp_path, monkeypatch):
    """CamVid path e2e: directory-split zip source, 11 classes with void->255,
    median-frequency class weights, pinned mean/std, and a TEST split that
    triggers the final test-set evaluation (reference: camvid_dataset.py)."""
    from cutmix_seg_tpu.data import sources
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    orig = sources.CamVidDataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, zip_path=None):
        orig(self, n_val, val_rng, trainval_perm, zip_path or camvid_zip)

    monkeypatch.setattr(sources.CamVidDataSource, "__init__", patched)
    monkeypatch.setattr(sources.CamVidDataSource, "canvas_hw", (48, 48))

    p = _params(None, dataset="camvid", crop_size="32,32", num_epochs=1,
                iters_per_epoch=3, batch_size=2, n_sup=4, conf_thresh=0.5)
    job.submit("test_camvid", "r", train_seg_semisup_mask_mt, p,
               results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / "test_camvid" / "r" / "log_r.txt").read_text()
    assert "VAL mIoU=" in log
    assert "FINAL TEST: mIoU=" in log  # test split present -> final test eval


@pytest.mark.slow
def test_mask_mt_trainer_eval_spatial(tiny_zip, tmp_path, monkeypatch):
    """--eval_spatial: per-epoch validation partitions the image H axis over
    the mesh; the run completes and reports a sane mIoU."""
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    job.submit(
        "test_mask_mt_sp", "run1", train_seg_semisup_mask_mt,
        _params(tiny_zip, eval_spatial=True, n_devices=8, num_epochs=1,
                save_preds=True),
        results_root=str(tmp_path / "results"))
    run_dir = tmp_path / "results" / "test_mask_mt_sp" / "run1"
    log = (run_dir / "log_run1.txt").read_text()
    assert "Epoch 1:" in log and "VAL mIoU=" in log
    # finalise() prediction export also goes through the spatial path
    assert len(os.listdir(run_dir / "preds")) > 0


def test_trainer_end_to_end_block32_dropout_arch(tiny_zip, tmp_path,
                                                 monkeypatch):
    """Engine-level regression for the U-Net-family traits that crashed the
    ISIC recipe: block_size (32, 32) (init probe must round up) and dropout
    (teacher forwards run train=True and need a dropout RNG)."""
    import flax.linen as nn
    import jax

    from cutmix_seg_tpu.models.common import batch_norm
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    class Block32DropNet(nn.Module):
        num_classes: int
        dtype: object = None

        @nn.compact
        def __call__(self, x, train=False, freeze_bn=False):
            assert x.shape[1] % 32 == 0 and x.shape[2] % 32 == 0, x.shape
            x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
            x = batch_norm(use_running_average=not train or freeze_bn,
                           name="bn")(x)
            x = nn.relu(x)
            x = nn.Dropout(0.3, deterministic=not train)(x)
            x = nn.Conv(self.num_classes, (1, 1))(x)
            return jax.image.resize(
                x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
                "bilinear")

    name = "tiny_block32_dropout_test"
    if name not in registry.names():
        @registry.register(name)
        def factory(num_classes, dtype=None, pretrained=True):
            return SegModel(
                name=name,
                module=Block32DropNet(num_classes=num_classes, dtype=dtype),
                mean=np.zeros(3), std=np.ones(3), block_size=(32, 32),
                param_label=_param_label,
            )

    _patch_zip(monkeypatch, tiny_zip)
    p = _params(tiny_zip, arch=name, freeze_bn=False, num_epochs=1,
                save_model=False)
    job.submit("test_block32_dropout", "r", train_seg_semisup_mask_mt, p,
               results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / "test_block32_dropout" / "r"
           / "log_r.txt").read_text()
    assert "Epoch 1:" in log and "VAL mIoU=" in log


def test_mask_mt_trainer_grad_accum(tiny_zip, tmp_path, monkeypatch):
    """--grad_accum 2: the full trainer runs with the chunked step (one
    optimizer update per iteration, half-batch peak activations)."""
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    job.submit(
        "test_mask_mt_ga", "run1", train_seg_semisup_mask_mt,
        _params(tiny_zip, grad_accum=2, num_epochs=1, save_model=False),
        results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / "test_mask_mt_ga" / "run1"
           / "log_run1.txt").read_text()
    assert "Epoch 1:" in log and "VAL mIoU=" in log


def test_mask_mt_trainer_spatial_train_matches_data_parallel(
        tiny_zip, tmp_path, monkeypatch):
    """--spatial_train 2: the fused train step reshards the augmented crops
    H-over-'model' (mesh 4x2). With the same data-axis size (and therefore
    identical host streams and global batches) as a plain 4-device
    data-parallel run, every epoch's losses and mIoU must match — the
    spatial mapping is a layout change, not a semantic one."""
    import json

    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    root = str(tmp_path / "results")
    job.submit("test_sp_train", "dp", train_seg_semisup_mask_mt,
               _params(tiny_zip, n_devices=4), results_root=root)
    job.submit("test_sp_train", "sp", train_seg_semisup_mask_mt,
               _params(tiny_zip, n_devices=8, spatial_train=2),
               results_root=root)

    runs = {}
    for desc in ("dp", "sp"):
        path = tmp_path / "results" / "test_sp_train" / desc / \
            f"metrics_{desc}.jsonl"
        runs[desc] = [json.loads(l) for l in
                      path.read_text().splitlines()]
    assert len(runs["dp"]) == len(runs["sp"]) == 2
    for a, b in zip(runs["dp"], runs["sp"]):
        for k in ("sup_loss", "cons_loss", "val_miou"):
            assert a[k] == pytest.approx(b[k], rel=2e-4, abs=1e-6), (k, a, b)


def test_spatial_train_rejects_indivisible_crop(tiny_zip, tmp_path,
                                                monkeypatch):
    """--spatial_train N with a crop height not divisible by N must fail at
    startup with a clear message, not mid-epoch."""
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    with pytest.raises(ValueError, match="spatial_train"):
        job.submit("test_sp_bad", "run", train_seg_semisup_mask_mt,
                   _params(tiny_zip, n_devices=8, spatial_train=3,
                           crop_size="32,32"),
                   results_root=str(tmp_path / "results"))


def test_resume_is_bit_exact_continuation(tiny_zip, tmp_path, monkeypatch):
    """--resume from an epoch-boundary checkpoint must reproduce the
    uninterrupted run bit-exactly: host randomness is a pure function of
    (seed, process, epoch) (engine._open_epoch_streams) and the in-step
    PRNG rides in the checkpointed state, so epochs 3-4 of a 2+resume run
    equal epochs 3-4 of a straight 4-epoch run — same losses, same final
    checkpoint bytes."""
    import re

    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    root = str(tmp_path / "results")

    job.submit("test_bitexact", "full", train_seg_semisup_mask_mt,
               _params(tiny_zip, num_epochs=4, checkpoint_interval=1,
                       save_model=False), results_root=root)
    job.submit("test_bitexact", "resumed", train_seg_semisup_mask_mt,
               _params(tiny_zip, num_epochs=2, checkpoint_interval=1,
                       save_model=False), results_root=root)
    # same desc + resume=True: continues in the same run dir (dedup waived)
    job.submit("test_bitexact", "resumed", train_seg_semisup_mask_mt,
               _params(tiny_zip, num_epochs=4, checkpoint_interval=1,
                       save_model=False, resume=True), results_root=root)

    d_full = tmp_path / "results" / "test_bitexact" / "full"
    d_res = tmp_path / "results" / "test_bitexact" / "resumed"
    log_res = (d_res / "log_resumed.txt").read_text()
    assert "Resumed from" in log_res

    # the training-metric parts of the epoch lines must match exactly
    def epoch_losses(text):
        return re.findall(r"Epoch (\d+): took [^,]+, (TRAIN [^\n]*)", text)

    full_lines = dict(epoch_losses((d_full / "log_full.txt").read_text()))
    res_lines = dict(epoch_losses(log_res))
    assert set(full_lines) == {"1", "2", "3", "4"}
    for ep in ("3", "4"):
        assert res_lines[ep] == full_lines[ep], (
            f"epoch {ep}: resumed diverged\n{res_lines[ep]}\n{full_lines[ep]}")

    # the final full-TrainState checkpoints are byte-identical
    a = (d_full / "checkpoints" / "ckpt_000000012.msgpack").read_bytes()
    b = (d_res / "checkpoints" / "ckpt_000000012.msgpack").read_bytes()
    assert a == b


def test_profile_dir_traces_without_extra_steps(tiny_zip, tmp_path,
                                                monkeypatch):
    """--profile_dir wraps 3 REGULAR iterations in the profiler trace; it
    must not add steps (extra steps would break the steps-per-epoch
    invariant that start_epoch derivation and bit-exact resume rely on)."""
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    prof = tmp_path / "prof"
    job.submit("test_prof", "run1", train_seg_semisup_mask_mt,
               _params(tiny_zip, num_epochs=1, iters_per_epoch=6,
                       profile_dir=str(prof), save_model=False,
                       checkpoint_interval=1),
               results_root=str(tmp_path / "results"))
    # trace artifacts written
    assert any(prof.rglob("*")), "no profiler artifacts"
    # step count is exactly iters_per_epoch (checkpoint at step 6, not 8+)
    ckpts = os.listdir(tmp_path / "results" / "test_prof" / "run1"
                       / "checkpoints")
    assert ckpts == ["ckpt_000000006.msgpack"], ckpts


def test_evaluate_model_cli_matches_trainer_eval(tiny_zip, tmp_path,
                                                 monkeypatch):
    """The standalone evaluator (tools/evaluate_model.py) must reproduce
    the trainer's final VAL mIoU exactly, from BOTH the saved model.msgpack
    and the full checkpoint (teacher net) — same metric pipeline, no
    trainer required."""
    import re

    from click.testing import CliRunner

    from cutmix_seg_tpu.tools.evaluate_model import main as eval_cli
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    _patch_zip(monkeypatch, tiny_zip)
    # SGD on purpose: the evaluator restores the network sub-tree from the
    # raw checkpoint dict, so it must not depend on the run's optimizer
    # chain shape (a template hardcoding adam broke on sgd checkpoints)
    job.submit("test_eval_cli", "run1", train_seg_semisup_mask_mt,
               _params(tiny_zip, num_epochs=1, checkpoint_interval=1,
                       opt_type="sgd", lr_sched="poly"),
               results_root=str(tmp_path / "results"))
    run_dir = tmp_path / "results" / "test_eval_cli" / "run1"
    log = (run_dir / "log_run1.txt").read_text()
    trainer_miou = re.findall(r"VAL mIoU=([\d.]+%)", log)[-1]

    common_args = ["--dataset", "cityscapes", "--arch", "tiny_deeplab_test",
                   "--batch_size", "2", "--compute_dtype", "float32",
                   "--n_devices", "2"]
    r1 = CliRunner().invoke(
        eval_cli, common_args + ["--model_path",
                                 str(run_dir / "model.msgpack")],
        catch_exceptions=False)
    assert r1.exit_code == 0, r1.output
    assert f"VAL mIoU={trainer_miou}" in r1.output, (
        r1.output, trainer_miou)

    r2 = CliRunner().invoke(
        eval_cli, common_args + ["--checkpoint",
                                 str(run_dir / "checkpoints"),
                                 "--net", "teacher"],
        catch_exceptions=False)
    assert r2.exit_code == 0, r2.output
    assert f"VAL mIoU={trainer_miou}" in r2.output, (
        r2.output, trainer_miou)


def test_multi_seed_resume_is_bit_exact(tiny_zip, tmp_path, monkeypatch):
    """Multi-seed resume mirrors the engine's guarantee: a 1+resume-to-2
    run reproduces the straight 2-epoch run's epoch-2 per-seed metrics and
    final stacked checkpoint bytes (epoch-folded stream seeds)."""
    import re

    from cutmix_seg_tpu.train.multi_seed_mask_mt import (
        train_seg_semisup_mask_mt_multiseed)

    _patch_zip(monkeypatch, tiny_zip)
    root = str(tmp_path / "results")

    def params(**kw):
        p = _params(tiny_zip, aug_strong_colour=False, save_model=False,
                    checkpoint_interval=1, **kw)
        del p["n_devices"]
        p["parallel_split_seeds"] = "12345,23456"
        return p

    job.submit("test_mseed_bx", "full", train_seg_semisup_mask_mt_multiseed,
               params(num_epochs=2), results_root=root)
    job.submit("test_mseed_bx", "res", train_seg_semisup_mask_mt_multiseed,
               params(num_epochs=1), results_root=root)
    job.submit("test_mseed_bx", "res", train_seg_semisup_mask_mt_multiseed,
               params(num_epochs=2, resume=True), results_root=root)

    d_full = tmp_path / "results" / "test_mseed_bx" / "full"
    d_res = tmp_path / "results" / "test_mseed_bx" / "res"
    log_res = (d_res / "log_res.txt").read_text()
    assert "Resumed from" in log_res

    def epoch2_lines(text):
        return sorted(re.findall(r"Epoch 2 \[seed \d+\][^,]*, (.*)", text))

    full2 = epoch2_lines((d_full / "log_full.txt").read_text())
    res2 = epoch2_lines(log_res)
    assert len(full2) == 2 and full2 == res2, (full2, res2)

    a = (d_full / "checkpoints" / "ckpt_000000006.msgpack").read_bytes()
    b = (d_res / "checkpoints" / "ckpt_000000006.msgpack").read_bytes()
    assert a == b


@pytest.mark.parametrize("algo", ["ict", "vat_mt", "aug_mt"])
def test_multi_seed_trainer_other_algorithms(tiny_zip, tmp_path, monkeypatch,
                                             algo):
    """--algorithm generalises the multi-seed sweep beyond mask_mt: each
    algorithm's REAL fused step vmapped over the seed axis, end-to-end."""
    from cutmix_seg_tpu.train.multi_seed_mask_mt import (
        train_seg_semisup_mask_mt_multiseed)

    _patch_zip(monkeypatch, tiny_zip)
    p = _params(tiny_zip, num_epochs=1, aug_strong_colour=False,
                save_model=False)
    del p["n_devices"]
    p["parallel_split_seeds"] = "12345,23456"
    p["algorithm"] = algo
    if algo == "ict":
        p["ict_alpha"] = 0.1
    elif algo == "vat_mt":
        p.update(vat_radius=0.5, adaptive_vat_radius=True,
                 vat_dir_from_student=False)
    else:
        p.update(aug_offset_range=8.0, aug_free_scale_rot=False)
    job.submit(f"test_mseed_{algo}", "run1",
               train_seg_semisup_mask_mt_multiseed, p,
               results_root=str(tmp_path / "results"))
    log = (tmp_path / "results" / f"test_mseed_{algo}" / "run1"
           / "log_run1.txt").read_text()
    assert "[seed 12345]" in log and "[seed 23456]" in log
    assert log.count("VAL mIoU=") == 2
