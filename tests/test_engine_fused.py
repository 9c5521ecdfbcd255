"""Fused-augmentation engine tests: the device augmentation traced into the
train step must be bit-identical to the staged (eager per-stream) programs,
and a trainer iteration must launch exactly ONE device program."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cutmix_seg_tpu.aug.params import GeomConfig
from cutmix_seg_tpu.data.loader import HostBatchBuilder
from cutmix_seg_tpu.ops.colour import ColourJitterConfig
from cutmix_seg_tpu.train.common import DeviceAugmentor
from cutmix_seg_tpu.train.engine import compose_mask_pair


class _MemSource:
    canvas_hw = (40, 40)

    def __init__(self, n=8, seed=0):
        rng = np.random.RandomState(seed)
        self.images = [rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
                       for _ in range(n)]
        self.labels = [rng.randint(0, 4, (40, 40)).astype(np.int32)
                       for _ in range(n)]

    def get_image(self, i):
        return self.images[i]

    def get_labels(self, i):
        return self.labels[i]


def test_fused_compose_matches_staged():
    """One jitted program containing sup + two unsup augmentations must
    reproduce the three staged augment_batch programs bit-exactly given the
    same host batches and colour key."""
    src = _MemSource()
    geom = GeomConfig(crop_size=(24, 24), mode="crop_scale_hung", hflip=True)
    colour = ColourJitterConfig()
    aug = DeviceAugmentor(np.full(3, 0.5), np.full(3, 0.25), (24, 24),
                          geom.mode, colour)

    sup_builder = HostBatchBuilder(src, geom, with_labels=True)
    uns_builder = HostBatchBuilder(src, geom, with_labels=False)
    rng = np.random.RandomState(1)
    host_sup = sup_builder.build(np.arange(4), rng)
    host_u0 = uns_builder.build(np.arange(4), rng)
    host_u1 = uns_builder.build(np.arange(4, 8), rng)
    key = jax.random.PRNGKey(42)

    # staged: three separate device programs (the round-1 pipeline)
    k0, k1 = jax.random.split(key)
    sup_s = aug.sup(host_sup)
    u0_s = aug.unsup(host_u0, k0)
    u1_s = aug.unsup(host_u1, k1)

    # fused: everything traced into one program
    @jax.jit
    def fused(raw, key):
        sup = aug.sup(raw["sup"])
        out = {"sup_x": sup["image"], "sup_y": sup["labels"]}
        out.update(compose_mask_pair(aug, raw, key))
        return out

    raw = jax.tree_util.tree_map(
        jnp.asarray, {"sup": dict(host_sup), "u0": dict(host_u0),
                      "u1": dict(host_u1)})
    out = fused(raw, key)

    # labels and masks must be exact; float images may differ by XLA fusion
    # reassociation between the standalone and fused programs (<= ~2.5e-7)
    np.testing.assert_array_equal(np.asarray(out["sup_y"]),
                                  np.asarray(sup_s["labels"]))
    np.testing.assert_array_equal(np.asarray(out["um0"]),
                                  np.asarray(u0_s["mask"]))
    np.testing.assert_array_equal(np.asarray(out["um1"]),
                                  np.asarray(u1_s["mask"]))
    for got, want in ((out["sup_x"], sup_s["image"]),
                      (out["ux0_tea"], u0_s["image"]),
                      (out["ux0_stu"], u0_s["image_stu"]),
                      (out["ux1_tea"], u1_s["image"]),
                      (out["ux1_stu"], u1_s["image_stu"])):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


@pytest.mark.slow
def test_trainer_single_program_per_iteration(tmp_path, monkeypatch):
    """augment_batch's Python wrapper must be entered only while TRACING the
    fused step (3 calls: sup + two unsup streams), never per executed
    iteration — i.e. one XLA program launch per train iter."""
    from cutmix_seg_tpu.core import job
    from cutmix_seg_tpu.models import registry
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.train import common as tcommon
    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt
    from tests.test_trainer_e2e import _params, _patch_zip
    import tests.test_trainer_e2e as e2e

    if "tiny_deeplab_test" not in registry.names():
        @registry.register("tiny_deeplab_test")
        def factory(num_classes, dtype=None, pretrained=True):
            return SegModel(
                name="tiny_deeplab_test",
                module=DeepLab2(num_classes=num_classes, layers=(1, 1, 1, 1),
                                dtype=dtype),
                mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
                param_label=_param_label)

    # build the tiny zip fixture manually (fixtures aren't importable)
    import zipfile
    rng = np.random.RandomState(0)
    path = tmp_path / "cityscapes_segmentation.zip"
    with zipfile.ZipFile(path, "w") as zf:
        for split, n in (("train", 8), ("val", 2)):
            for i in range(n):
                img = rng.randint(0, 255, size=(48, 48, 3), dtype=np.uint8)
                lab = rng.randint(7, 9, size=(48, 48), dtype=np.uint8)
                zf.writestr(f"{split}/s{i}_x.png", e2e._png_bytes(img))
                zf.writestr(f"{split}/s{i}_y.png", e2e._png_bytes(lab))
    tiny_zip = str(path)
    _patch_zip(monkeypatch, tiny_zip)

    calls = {"n": 0}
    orig = tcommon.augment_batch

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(tcommon, "augment_batch", counting)

    job.submit("test_fused_count", "r", train_seg_semisup_mask_mt,
               _params(tiny_zip, num_epochs=1, iters_per_epoch=5,
                       save_model=False),
               results_root=str(tmp_path / "results"))
    # sup + u0 + u1, traced once; a second entry set would mean per-iter
    # host dispatches crept back in
    assert calls["n"] == 3, calls["n"]
