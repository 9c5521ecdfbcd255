"""Data-layer tests: zip sources, split determinism (bit-compatibility with
the reference's RandomState semantics), loaders and eval batching."""

import os
import pickle
import zipfile

import numpy as np
import pytest
from PIL import Image

from cutmix_seg_tpu.data import datasets, sources
from cutmix_seg_tpu.data.loader import (
    HostBatchBuilder,
    InfiniteShuffler,
    eval_batches,
    train_stream,
)
from cutmix_seg_tpu.aug.params import GeomConfig


def _png_bytes(arr):
    import io

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def cityscapes_zip(tmp_path):
    rng = np.random.RandomState(0)
    path = tmp_path / "cityscapes_segmentation.zip"
    with zipfile.ZipFile(path, "w") as zf:
        for split, n in (("train", 6), ("val", 3)):
            for i in range(n):
                img = rng.randint(0, 255, size=(32, 64, 3), dtype=np.uint8)
                lab = rng.randint(0, 34, size=(32, 64), dtype=np.uint8)
                zf.writestr(f"{split}/sample{i}_x.png", _png_bytes(img))
                zf.writestr(f"{split}/sample{i}_y.png", _png_bytes(lab))
    return str(path)


@pytest.fixture
def isic_zip(tmp_path):
    rng = np.random.RandomState(1)
    path = tmp_path / "isic2017_segmentation.zip"
    with zipfile.ZipFile(path, "w") as zf:
        for split, n in (("train", 8), ("val", 4)):
            for i in range(n):
                img = rng.randint(0, 255, size=(24, 24, 3), dtype=np.uint8)
                lab = (rng.uniform(size=(24, 24)) * 255).astype(np.uint8)
                zf.writestr(f"{split}/img{i}_x.png", _png_bytes(img))
                zf.writestr(f"{split}/img{i}_y.png", _png_bytes(lab))
        zf.writestr(
            "rgb_mean_std.pkl",
            pickle.dumps({"rgb_mean": np.array([0.5, 0.4, 0.3]),
                          "rgb_std": np.array([0.2, 0.2, 0.2])}),
        )
    return str(path)


def test_cityscapes_source_splits_and_remap(cityscapes_zip):
    ds = sources.CityscapesDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        zip_path=cityscapes_zip)
    assert ds.num_classes == 19
    assert len(ds.train_ndx) == 6 and len(ds.val_ndx) == 3
    assert ds.test_ndx is None
    y = ds.get_labels(0)
    assert y.dtype == np.int32
    # void classes (e.g. raw id 0 = 'unlabeled') must map to 255
    assert set(np.unique(y)).issubset(set(range(19)) | {255})
    img = ds.get_image(0)
    assert img.shape == (32, 64, 3) and img.dtype == np.uint8


def test_holdout_split_semantics(cityscapes_zip):
    """n_val > 0: official val becomes test; last n_val of permuted train
    become val (reference: cityscapes_dataset.py:92-103)."""
    val_rng = np.random.RandomState(131)
    ds = sources.CityscapesDataSource(
        n_val=2, val_rng=val_rng, trainval_perm=None, zip_path=cityscapes_zip)
    assert len(ds.val_ndx) == 2
    assert len(ds.train_ndx) == 4
    assert len(ds.test_ndx) == 3
    # deterministic: rebuilding with the same seed gives the same split
    ds2 = sources.CityscapesDataSource(
        n_val=2, val_rng=np.random.RandomState(131), trainval_perm=None,
        zip_path=cityscapes_zip)
    np.testing.assert_array_equal(ds.val_ndx, ds2.val_ndx)
    # and matches the exact RandomState(131) permutation semantics
    train_all = np.array([i for i, n in enumerate(ds.sample_names)
                          if n.startswith("train/")])
    perm = np.random.RandomState(131).permutation(len(train_all))
    np.testing.assert_array_equal(ds.val_ndx, train_all[perm][-2:])


def test_isic_source(isic_zip):
    ds = sources.ISIC2017DataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        zip_path=isic_zip)
    assert ds.num_classes == 2
    y = ds.get_labels(0)
    assert set(np.unique(y)).issubset({0, 1})
    mean, std = ds.get_mean_std()
    np.testing.assert_allclose(mean, [0.5, 0.4, 0.3])


def test_load_dataset_sup_selection(cityscapes_zip, monkeypatch):
    """sup_ndx must be train_ndx[RandomState(split_seed).permutation[:n_sup]]
    exactly (reference: datapipe/datasets.py:47-64)."""
    out = datasets.load_dataset(
        "cityscapes", n_val=-1, val_seed=131, n_sup=3, n_unsup=-1,
        split_seed=12345, split_path=None, zip_path=cityscapes_zip)
    ds = out["ds_src"]
    perm = np.random.RandomState(12345).permutation(len(ds.train_ndx))
    np.testing.assert_array_equal(out["sup_ndx"], ds.train_ndx[perm[:3]])
    np.testing.assert_array_equal(out["unsup_ndx"], ds.train_ndx[perm])


def test_load_dataset_split_path(cityscapes_zip, tmp_path):
    """A pickled permutation reorders train; sup picks its head with an
    identity train_perm (reference: datasets.py:50-56)."""
    perm = np.array([5, 2, 0, 1, 4, 3])
    split_path = tmp_path / "split_0.pkl"
    with open(split_path, "wb") as f:
        pickle.dump(perm, f)
    out = datasets.load_dataset(
        "cityscapes", n_val=-1, val_seed=131, n_sup=2, n_unsup=-1,
        split_seed=12345, split_path=str(split_path), zip_path=cityscapes_zip)
    ds = out["ds_src"]
    train_all = np.array([i for i, n in enumerate(ds.sample_names)
                          if n.startswith("train/")])
    np.testing.assert_array_equal(out["sup_ndx"], train_all[perm][:2])


def test_infinite_shuffler_covers_subset():
    rng = np.random.RandomState(0)
    sh = InfiniteShuffler([10, 20, 30, 40, 50], rng)
    first_pass = sh.take(5)
    assert sorted(first_pass) == [10, 20, 30, 40, 50]
    batch = sh.take(7)  # crosses a reshuffle boundary
    assert set(batch).issubset({10, 20, 30, 40, 50})


def test_host_batch_builder_and_stream(cityscapes_zip):
    ds = sources.CityscapesDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        zip_path=cityscapes_zip)
    geom = GeomConfig(crop_size=(24, 24), mode="crop", hflip=True)
    builder = HostBatchBuilder(ds, geom, with_labels=True, canvas_hw=(32, 64),
                               ship_window=False)
    batch = builder.build(ds.train_ndx[:4], np.random.RandomState(0))
    assert batch["canvas"].shape == (4, 32, 64, 3)
    assert batch["labels"].shape == (4, 32, 64)
    np.testing.assert_array_equal(batch["sizes"], [[32, 64]] * 4)
    assert batch["m"].shape == (4, 2, 3)
    # canvas content matches the decoded image
    np.testing.assert_array_equal(batch["canvas"][0], ds.get_image(int(ds.train_ndx[0])))

    # default path ships only the crop-sized transfer window
    builder_w = HostBatchBuilder(ds, geom, with_labels=True, canvas_hw=(32, 64))
    batch_w = builder_w.build(ds.train_ndx[:4], np.random.RandomState(0))
    assert batch_w["canvas"].shape == (4, 26, 26, 3)

    stream = train_stream(builder, ds.train_ndx, batch_size=3, seed=7)
    b1 = next(stream)
    b2 = next(stream)
    assert b1["canvas"].shape[0] == 3 and b2["canvas"].shape[0] == 3
    stream.close()


def test_eval_batches_padding(cityscapes_zip):
    ds = sources.CityscapesDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        zip_path=cityscapes_zip)
    batches = list(eval_batches(ds, ds.val_ndx, batch_size=2, block_size=(32, 32)))
    assert len(batches) == 2
    assert batches[0]["count"] == 2 and batches[1]["count"] == 1
    # padded entry carries all-255 labels so it can't perturb the metric
    assert (batches[1]["labels"][1] == 255).all()
    # canvas rounded to block multiples
    assert batches[0]["canvas"].shape[1] % 32 == 0
    assert batches[0]["canvas"].shape[2] % 32 == 0


def test_ship_window_parity(cityscapes_zip):
    """Slicing the host->device transfer window must not change the augmented
    output (constant-border modes): windowed and full-canvas paths bit-agree."""
    import jax.numpy as jnp

    from cutmix_seg_tpu.aug.device import augment_batch
    from cutmix_seg_tpu.data.loader import ship_window_hw

    ds = sources.CityscapesDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        zip_path=cityscapes_zip)
    for mode in ("crop", "crop_scale_hung"):
        geom = GeomConfig(crop_size=(16, 16), mode=mode, hflip=True)
        assert ship_window_hw(geom, (32, 64)) is not None

        def run(ship):
            builder = HostBatchBuilder(ds, geom, with_labels=True,
                                       canvas_hw=(32, 64), ship_window=ship)
            batch = builder.build(ds.train_ndx[:4], np.random.RandomState(7))
            out = augment_batch(
                jnp.asarray(batch["canvas"]), jnp.asarray(batch["labels"]),
                jnp.asarray(batch["m"]), jnp.asarray(batch["sizes"]),
                jnp.asarray(batch["interp"]),
                np.zeros(3), np.ones(3), None,
                out_hw=(16, 16), with_labels=True, border="constant")
            return batch, out

        b_full, o_full = run(False)
        b_win, o_win = run(True)
        assert b_win["canvas"].shape[1:3] != b_full["canvas"].shape[1:3]
        np.testing.assert_allclose(np.asarray(o_win["image"]),
                                   np.asarray(o_full["image"]), atol=1e-5,
                                   err_msg=mode)
        np.testing.assert_array_equal(np.asarray(o_win["labels"]),
                                      np.asarray(o_full["labels"]))
        np.testing.assert_allclose(np.asarray(o_win["mask"]),
                                   np.asarray(o_full["mask"]), atol=1e-5)


def test_ship_window_disabled_for_reflect_mode():
    from cutmix_seg_tpu.data.loader import ship_window_hw

    geom = GeomConfig(crop_size=(16, 16), mode="crop_rotate_scale",
                      rot_mag_deg=45.0, max_scale=1.1)
    assert ship_window_hw(geom, (64, 64)) is None
    # window never larger than what helps
    small = GeomConfig(crop_size=(30, 30), mode="crop")
    assert ship_window_hw(small, (32, 32)) is None


def test_resident_store_matches_streaming(cityscapes_zip):
    """Device-resident index mode produces bit-identical training batches to
    canvas streaming: same geometry RNG draws, same augmented tensors
    (data/resident.py)."""
    import jax.numpy as jnp

    from cutmix_seg_tpu.aug.device import augment_batch
    from cutmix_seg_tpu.data.resident import (
        ResidentDataset,
        gather_part,
        resident_nbytes,
    )
    from cutmix_seg_tpu.parallel.mesh import make_mesh

    ds = sources.CityscapesDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        zip_path=cityscapes_zip)
    mesh = make_mesh(1)
    res = ResidentDataset(ds, ds.train_ndx, mesh, with_labels=True)
    assert resident_nbytes(ds, len(ds.train_ndx), True) >= res.device[
        "canvas"].size

    geom = GeomConfig(crop_size=(16, 16), mode="crop_scale_hung", hflip=True)
    stream_b = HostBatchBuilder(ds, geom, with_labels=True)
    index_b = HostBatchBuilder(ds, geom, with_labels=True, resident=res)

    idx = np.asarray(ds.train_ndx[:4])
    host = stream_b.build(idx, np.random.RandomState(3))
    part = index_b.build(idx, np.random.RandomState(3))
    # identical RNG consumption (streaming re-anchors matrices to its
    # transfer window, so raw fields differ; the augmented output must not)

    def aug(b):
        return augment_batch(
            jnp.asarray(b["canvas"]), jnp.asarray(b["labels"]),
            jnp.asarray(b["m"]), jnp.asarray(b["sizes"]),
            jnp.asarray(b["interp"]), np.zeros(3), np.ones(3), None,
            out_hw=(16, 16), with_labels=True, border="constant")

    gathered = gather_part(
        {k: jnp.asarray(v) for k, v in res.device.items()},
        {k: jnp.asarray(v) for k, v in part.items()}, with_labels=True)
    o_stream, o_res = aug(host), aug(gathered)
    np.testing.assert_allclose(np.asarray(o_res["image"]),
                               np.asarray(o_stream["image"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(o_res["labels"]),
                                  np.asarray(o_stream["labels"]))
    np.testing.assert_allclose(np.asarray(o_res["mask"]),
                               np.asarray(o_stream["mask"]), atol=1e-5)


def test_resident_rejects_unstaged_indices(cityscapes_zip):
    from cutmix_seg_tpu.data.resident import ResidentDataset
    from cutmix_seg_tpu.parallel.mesh import make_mesh

    ds = sources.CityscapesDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        zip_path=cityscapes_zip)
    res = ResidentDataset(ds, ds.train_ndx[:3], make_mesh(1))
    with pytest.raises(KeyError):
        res.rows(np.asarray([ds.train_ndx[4]]))
