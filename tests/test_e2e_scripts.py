"""The e2e-script synthetic zip generators must produce source-valid archives.

scripts/tpu_e2e_{cityscapes,isic}.py generate real-resolution synthetic
datasets in the converters' exact output formats; these tests build small
instances and construct the actual DataSources on them, so format drift
(name scheme, label encoding, rgb stats pickle) is caught without TPU runs.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest


def _load(name):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_isic_zip_generator_is_source_valid(tmp_path):
    from cutmix_seg_tpu.data.sources import ISIC2017DataSource

    mod = _load("tpu_e2e_isic")
    zp = str(tmp_path / "isic2017_segmentation.zip")
    mod.make_zip(zp, n_train=4, n_val=2, hw=(64, 64), seed=1)

    src = ISIC2017DataSource(n_val=0, val_rng=np.random.RandomState(0),
                             trainval_perm=None, zip_path=zp)
    assert src.num_classes == 2
    assert len(src.train_ndx) == 4 and len(src.val_ndx) == 2
    img = src.get_image(int(src.train_ndx[0]))
    lab = src.get_labels(int(src.train_ndx[0]))
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert lab.shape == (64, 64) and set(np.unique(lab)) <= {0, 1}
    assert 0 < lab.mean() < 1, "lesion must cover part of the image"
    mean, std = src.get_mean_std()
    np.testing.assert_allclose(mean, np.full(3, 0.6))
    np.testing.assert_allclose(std, np.full(3, 0.2))


@pytest.mark.parametrize("task", ["easy", "hard"])
def test_cityscapes_zip_generator_is_source_valid(tmp_path, task):
    from cutmix_seg_tpu.data.sources import CityscapesDataSource

    mod = _load("tpu_e2e_cityscapes")
    zp = str(tmp_path / "cityscapes_segmentation.zip")
    mod.make_zip(zp, n_train=3, n_val=2, hw=(64, 128), seed=1, task=task)

    src = CityscapesDataSource(n_val=0, val_rng=np.random.RandomState(0),
                               trainval_perm=None, zip_path=zp)
    assert src.num_classes == 19
    assert len(src.train_ndx) == 3 and len(src.val_ndx) == 2
    img = src.get_image(int(src.train_ndx[0]))
    lab = src.get_labels(int(src.train_ndx[0]))
    assert img.shape == (64, 128, 3) and img.dtype == np.uint8
    valid = lab[lab != 255]
    assert valid.size and valid.min() >= 0 and valid.max() < 19


def test_voc_tree_generator_is_source_valid(tmp_path):
    from cutmix_seg_tpu.data.sources import PascalVOCDataSource

    mod = _load("tpu_e2e_voc")
    root = mod.make_voc_tree(str(tmp_path / "VOC2012"), n_train=3, n_val=2,
                             seed=1)
    src = PascalVOCDataSource(n_val=0, val_rng=np.random.RandomState(0),
                              trainval_perm=None, root=root)
    assert src.num_classes == 21
    assert len(src.train_ndx) == 3 and len(src.val_ndx) == 2
    i = int(src.train_ndx[0])
    img, lab = src.get_image(i), src.get_labels(i)
    assert img.ndim == 3 and img.dtype == np.uint8
    assert max(img.shape[:2]) == 500 and min(img.shape[:2]) < 500
    assert img.shape[:2] == lab.shape
    valid = lab[lab != 255]
    assert valid.size and valid.max() <= 20
    assert (lab == 255).any(), "VOC-style boundary band expected"


def test_camvid_zip_generator_is_source_valid(tmp_path):
    from cutmix_seg_tpu.data.sources import CamVidDataSource

    mod = _load("tpu_e2e_camvid")
    zp = str(tmp_path / "camvid.zip")
    mod.make_zip(zp, n_train=3, n_val=2, n_test=2, hw=(48, 64), seed=1)

    src = CamVidDataSource(n_val=0, val_rng=np.random.RandomState(0),
                           trainval_perm=None, zip_path=zp)
    assert src.num_classes == 11
    assert len(src.train_ndx) == 3 and len(src.val_ndx) == 2
    assert len(src.test_ndx) == 2
    img = src.get_image(int(src.train_ndx[0]))
    lab = src.get_labels(int(src.train_ndx[0]))
    assert img.shape == (48, 64, 3) and img.dtype == np.uint8
    # void band (raw value 11) must arrive remapped to 255
    assert 255 in np.unique(lab) and lab.max() == 255
    assert set(np.unique(lab)) - {255} <= set(range(11))


def test_base_params_matches_pre_refactor_golden():
    """scripts/_e2e_common.base_params + each driver's overrides must
    reproduce the exact inline dicts the four scripts shipped before the
    refactor (any drift in the shared skeleton silently changes a committed
    evidence recipe)."""
    scripts_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        from _e2e_common import base_params
    finally:
        sys.path.remove(scripts_dir)

    common = dict(
        model="mean_teacher", freeze_bn=True, opt_type="adam",
        sgd_momentum=0.9, sgd_nesterov=False, sgd_weight_decay=5e-4,
        lr_sched="none", lr_step_epochs="", lr_step_gamma=0.1,
        lr_poly_power=0.9, teacher_alpha=0.99, bin_fill_holes=False,
        aug_hflip=True, aug_vflip=False, aug_hvflip=False,
        aug_scale_hung=False, aug_max_scale=1.0,
        aug_scale_non_uniform=False, aug_rot_mag=0.0,
        aug_strong_colour=True, aug_colour_brightness=0.4,
        aug_colour_contrast=0.4, aug_colour_saturation=0.4,
        aug_colour_hue=0.1, aug_colour_prob=0.8,
        aug_colour_greyscale_prob=0.2, mask_mode="mix",
        mask_prop_range="0.5", boxmask_n_boxes=1,
        boxmask_fixed_aspect_ratio=False, boxmask_by_size=False,
        boxmask_outside_bounds=False, boxmask_no_invert=False,
        cons_loss_fn="var", conf_per_pixel=False, unsup_batch_ratio=1,
        n_unsup=-1, n_val=-1, split_seed=12345, split_path=None,
        val_seed=131, save_preds=False, save_model=False, num_workers=4,
        compute_dtype="bfloat16", n_devices=-1, resume=False,
        nan_check_interval=100, seed=0, no_pretrained=True,
        # round 4: device-resident small-dataset store (data/resident.py) —
        # 'auto' preserves every committed recipe's semantics (bit-equal
        # training stream; tests/test_data.py::test_resident_store_matches_streaming)
        data_on_device="auto",
    )
    run = dict(cons_weight=1.0, conf_thresh=0.97, rampup=-1, num_epochs=3,
               iters_per_epoch=50, batch_size=4, n_sup=8,
               checkpoint_interval=10, learning_rate=3e-5, arch="a")

    golden_city = dict(common, dataset="cityscapes", crop_size="256,512",
                       **run)
    assert base_params(dataset="cityscapes", crop_size="256,512",
                       **run) == golden_city

    golden_voc = dict(common, dataset="pascal", crop_size="321,321",
                      aug_scale_hung=True, **run)
    assert base_params(dataset="pascal", crop_size="321,321",
                       aug_scale_hung=True, **run) == golden_voc

    golden_isic = dict(common, dataset="isic2017", freeze_bn=False,
                       opt_type="sgd", lr_sched="poly", bin_fill_holes=True,
                       crop_size="224,224", aug_vflip=True, aug_hvflip=True,
                       aug_max_scale=1.1, aug_rot_mag=45.0, **run)
    assert base_params(dataset="isic2017", freeze_bn=False, opt_type="sgd",
                       lr_sched="poly", bin_fill_holes=True,
                       crop_size="224,224", aug_vflip=True, aug_hvflip=True,
                       aug_max_scale=1.1, aug_rot_mag=45.0,
                       **run) == golden_isic

    golden_camvid = dict(common, dataset="camvid", crop_size="224,320",
                         **run)
    assert base_params(dataset="camvid", crop_size="224,320",
                       **run) == golden_camvid
