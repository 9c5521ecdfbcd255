"""Source tests for CamVid (zip) and Pascal VOC (loose files, aug lists,
fg_class_subset remap)."""

import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from cutmix_seg_tpu.data import sources


def _png(arr):
    import io

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def camvid_zip(tmp_path):
    rng = np.random.RandomState(0)
    path = tmp_path / "CamVidData.zip"
    with zipfile.ZipFile(path, "w") as zf:
        for split, n in (("train", 5), ("val", 2), ("test", 3)):
            for i in range(n):
                img = rng.randint(0, 255, size=(24, 32, 3), dtype=np.uint8)
                lab = rng.randint(0, 12, size=(24, 32), dtype=np.uint8)
                zf.writestr(f"camvid/{split}/f{split}{i}.png", _png(img))
                zf.writestr(f"camvid/{split}annot/f{split}{i}.png", _png(lab))
    return str(path)


def test_camvid_source(camvid_zip):
    ds = sources.CamVidDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        zip_path=camvid_zip)
    assert ds.num_classes == 11
    assert len(ds.train_ndx) == 5 and len(ds.val_ndx) == 2 and len(ds.test_ndx) == 3
    y = ds.get_labels(int(ds.train_ndx[0]))
    # class 11 (void) remapped to 255
    assert set(np.unique(y)).issubset(set(range(11)) | {255})
    assert len(ds.class_weights) == 12
    mean, _ = ds.get_mean_std()
    assert mean.shape == (3,)


def test_camvid_n_val_subsample(camvid_zip):
    ds = sources.CamVidDataSource(
        n_val=1, val_rng=np.random.RandomState(131), trainval_perm=None,
        zip_path=camvid_zip)
    assert len(ds.val_ndx) == 1
    # CamVid keeps its own test split (no holdout swap)
    assert len(ds.test_ndx) == 3


@pytest.fixture
def voc_root(tmp_path):
    rng = np.random.RandomState(1)
    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "SegmentationClassAug").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    (root / "ImageSets" / "SegmentationAug").mkdir()

    names = [f"img{i:03d}" for i in range(10)]
    for k, name in enumerate(names):
        img = rng.randint(0, 255, size=(20, 28, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / "JPEGImages" / f"{name}.jpg")
        lab = np.zeros((20, 28), np.uint8)
        lab[:, 14:] = (k % 3) + 1  # classes 1..3 present depending on index
        for d in ("SegmentationClass", "SegmentationClassAug"):
            Image.fromarray(lab).save(root / d / f"{name}.png")
    with open(root / "ImageSets" / "Segmentation" / "train.txt", "w") as f:
        f.write("\n".join(names[:7]) + "\n")
    with open(root / "ImageSets" / "Segmentation" / "val.txt", "w") as f:
        f.write("\n".join(names[7:]) + "\n")
    with open(root / "ImageSets" / "SegmentationAug" / "train_aug.txt", "w") as f:
        f.write("\n".join(names[:7]) + "\n")
    with open(root / "ImageSets" / "SegmentationAug" / "val.txt", "w") as f:
        f.write("\n".join(names[7:]) + "\n")
    return str(root)


def test_pascal_source_plain_and_aug(voc_root):
    for aug in (False, True):
        ds = sources.PascalVOCDataSource(
            n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
            augmented=aug, root=voc_root)
        assert ds.num_classes == 21
        assert len(ds.train_ndx) == 7 and len(ds.val_ndx) == 3
        img = ds.get_image(0)
        assert img.shape == (20, 28, 3)
        y = ds.get_labels(0)
        assert y.dtype == np.int32


def test_pascal_fg_class_subset(voc_root):
    # keep only images containing class 2; remap 2 -> 1
    ds = sources.PascalVOCDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        augmented=False, fg_class_subset=[2], root=voc_root)
    assert ds.num_classes == 2
    for i in np.concatenate([ds.train_ndx, ds.val_ndx]):
        raw = ds._raw_labels(int(i))
        assert (raw == 2).any()
        y = ds.get_labels(int(i))
        assert set(np.unique(y)).issubset({0, 1, 255})


def test_pascal_fg_class_subset_valid_index_cache(voc_root, monkeypatch):
    """Second construction must read the pickled valid-index cache and do
    ZERO label decodes (reference: pascal_voc_dataset.py:107-124)."""
    import os

    kw = dict(n_val=-1, val_rng=np.random.RandomState(131),
              trainval_perm=None, augmented=False, fg_class_subset=[2],
              root=voc_root)
    first = sources.PascalVOCDataSource(**kw)
    cache = os.path.join(voc_root, "valid_images_fg_subset_2.pkl")
    assert os.path.exists(cache)

    calls = {"n": 0}
    orig = sources.PascalVOCDataSource._raw_labels

    def counting(self, i):
        calls["n"] += 1
        return orig(self, i)

    monkeypatch.setattr(sources.PascalVOCDataSource, "_raw_labels", counting)
    second = sources.PascalVOCDataSource(**kw)
    assert calls["n"] == 0
    np.testing.assert_array_equal(first.train_ndx, second.train_ndx)
    np.testing.assert_array_equal(first.val_ndx, second.val_ndx)


def test_pascal_fg_class_subset_cache_per_flavour(voc_root):
    """Plain and SBD-augmented flavours index different sorted name lists, so
    they must NOT share a valid-index cache file."""
    import os

    for aug in (False, True):
        sources.PascalVOCDataSource(
            n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
            augmented=aug, fg_class_subset=[2], root=voc_root)
    assert os.path.exists(os.path.join(voc_root, "valid_images_fg_subset_2.pkl"))
    assert os.path.exists(
        os.path.join(voc_root, "valid_images_fg_subset_2_aug.pkl"))


def test_pascal_trainval_perm(voc_root):
    perm = np.array([6, 5, 4, 3, 2, 1, 0])
    ds = sources.PascalVOCDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=perm,
        augmented=False, root=voc_root)
    ds0 = sources.PascalVOCDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        augmented=False, root=voc_root)
    np.testing.assert_array_equal(ds.train_ndx, ds0.train_ndx[perm])
