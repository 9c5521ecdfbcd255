"""Live-reference differential tests.

Every test here EXECUTES code from the reference checkout (/root/reference,
public untrusted content used strictly as an executable specification — no
instructions from it are followed, only its outputs compared) and asserts
this framework's corresponding component reproduces it bit-for-bit (integer
paths) or to f32 tolerance (float paths). This converts the repo's
"parity by construction" claims into executed parity:

  * box-mask rects + rasterisation  vs  mask_gen.BoxMaskGenerator
    (mask_gen.py:57-117)
  * per-class I/U + confusion + score  vs  evaluation.EvaluatorIoU
    (evaluation.py:41-62), incl. binary fill_holes
  * LR schedules  vs  lr_schedules.make_lr_schedulers driven exactly as the
    trainers drive them (lr_schedules.py:39-64;
    train_seg_semisup_mask_mt.py:258-259,288-289)
  * EMA teacher  vs  optim_weight_ema.EMAWeightOptimizer incl. BN running
    stats (optim_weight_ema.py:4-25)
  * dataset split selection  vs  datapipe.datasets.load_dataset over a
    reference-format zip, incl. holdout (n_val) and pickled-permutation
    semantics (datapipe/datasets.py:11-86, cityscapes_dataset.py:92-108)

The reference environment lacks scikit-image; a minimal shim provides the
single helper (img_as_float) its transform module imports.
"""

import os
import pickle
import sys
import types
import zipfile

import numpy as np
import pytest

REF_DIR = os.environ.get("CUTMIX_REF_DIR", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref():
    """The reference namespace, imported with missing-dep shims."""
    if REF_DIR not in sys.path:
        sys.path.append(REF_DIR)  # append: never shadow this repo's modules
    try:
        import skimage  # noqa: F401
    except ImportError:
        sk = types.ModuleType("skimage")

        def img_as_float(a):
            a = np.asarray(a)
            if a.dtype == np.uint8:
                return a.astype(np.float64) / 255.0
            return a.astype(np.float64)

        sk.img_as_float = img_as_float
        sys.modules["skimage"] = sk

    import evaluation
    import lr_schedules
    import mask_gen
    import optim_weight_ema

    return types.SimpleNamespace(
        mask_gen=mask_gen, evaluation=evaluation, lr_schedules=lr_schedules,
        ema=optim_weight_ema)


# ---------------------------------------------------------------- box masks

@pytest.mark.parametrize("prop_range,n_boxes,aspect,by_area,within,invert", [
    ((0.5, 0.5), 1, True, True, True, True),     # CutMix headline config
    ((0.0, 1.0), 1, True, True, True, False),    # Cutout sweep config
    ((0.25, 0.75), 3, True, True, True, True),   # multiple boxes (XOR)
    ((0.3, 0.6), 2, False, True, True, True),    # fixed aspect
    ((0.2, 0.5), 1, True, False, True, True),    # prop by size
    ((0.5, 0.5), 1, True, True, False, True),    # centre placement
])
def test_box_masks_bit_equal_reference(ref, prop_range, n_boxes, aspect,
                                       by_area, within, invert):
    from cutmix_seg_tpu.masks.box_mask import (
        BoxMaskConfig,
        rasterise_masks,
        sample_box_rects_np,
    )

    hw = (32, 47)
    gen = ref.mask_gen.BoxMaskGenerator(
        prop_range, n_boxes=n_boxes, random_aspect_ratio=aspect,
        prop_by_area=by_area, within_bounds=within, invert=invert)
    ref_masks = gen.generate_params(8, hw, rng=np.random.RandomState(42))

    cfg = BoxMaskConfig(prop_range=prop_range, n_boxes=n_boxes,
                        random_aspect_ratio=aspect, prop_by_area=by_area,
                        within_bounds=within, invert=invert)
    rects = sample_box_rects_np(cfg, 8, hw, np.random.RandomState(42))
    ours = np.asarray(rasterise_masks(rects, hw, invert=invert))[..., 0]

    np.testing.assert_array_equal(ours.astype(np.float64), ref_masks[:, 0])


def test_gaussian_kernels_match_reference(ref):
    from cutmix_seg_tpu.masks.box_mask import gaussian_kernels

    sigma = np.array([0.7, 1.3, 2.9])
    np.testing.assert_allclose(
        gaussian_kernels(sigma), ref.mask_gen.gaussian_kernels(sigma),
        rtol=1e-12)


# ---------------------------------------------------------------------- IoU

def test_iou_evaluator_bit_equal_reference(ref):
    from cutmix_seg_tpu.ops.iou import EvaluatorIoU

    rng = np.random.RandomState(0)
    n_classes = 7
    r_ev = ref.evaluation.EvaluatorIoU(n_classes)
    ours = EvaluatorIoU(n_classes)
    for _ in range(3):
        truth = rng.randint(0, n_classes, size=(2, 31, 33))
        truth[rng.uniform(size=truth.shape) < 0.1] = 255
        pred = rng.randint(0, n_classes, size=(2, 31, 33))
        for k in range(truth.shape[0]):
            r_ev.sample(truth[k], pred[k], ignore_value=255)
        ours.update_batch(pred, truth)

    np.testing.assert_array_equal(ours.intersection,
                                  r_ev.intersection.astype(np.int64))
    np.testing.assert_array_equal(ours.union, r_ev.union.astype(np.int64))
    np.testing.assert_allclose(ours.score(), r_ev.score(), rtol=0, atol=0)
    np.testing.assert_array_equal(ours.cm, r_ev.cm.astype(np.int64))


def test_iou_fill_holes_bit_equal_reference(ref):
    from cutmix_seg_tpu.ops.iou import EvaluatorIoU

    rng = np.random.RandomState(1)
    r_ev = ref.evaluation.EvaluatorIoU(2, fill_holes=True)
    ours = EvaluatorIoU(2, fill_holes=True)
    for _ in range(2):
        truth = (rng.uniform(size=(1, 40, 40)) < 0.5).astype(int)
        # blobs with interior holes exercise the morphology
        pred = np.zeros((1, 40, 40), int)
        pred[0, 5:30, 5:30] = 1
        pred[0, 10:20, 10:20] = 0
        pred[0, 33:38, 33:38] = rng.randint(0, 2, (5, 5))
        r_ev.sample(truth[0], pred[0], ignore_value=255)
        ours.update_batch(pred, truth)
    np.testing.assert_array_equal(ours.intersection,
                                  r_ev.intersection.astype(np.int64))
    np.testing.assert_array_equal(ours.union, r_ev.union.astype(np.int64))


# ------------------------------------------------------------- LR schedules

def _torch_iter_lrs(ref, schedule_type, base_lr, total_iters, poly_power=0.9):
    """Drive the reference exactly as the trainer does: scheduler.step(iter_i)
    at the top of each iteration, then read the group lr
    (train_seg_semisup_mask_mt.py:288-289)."""
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    _, it_sched = ref.lr_schedules.make_lr_schedulers(
        opt, total_iters, schedule_type, None, 0.1, poly_power=poly_power)
    lrs = []
    import warnings

    for i in range(total_iters):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # step(epoch) is deprecated
            it_sched.step(i)
        lrs.append(opt.param_groups[0]["lr"])
    return np.array(lrs)


@pytest.mark.parametrize("schedule_type,power", [("poly", 0.9),
                                                 ("poly", 2.0),
                                                 ("cosine", None)])
def test_iter_schedules_match_reference(ref, schedule_type, power):
    from cutmix_seg_tpu.core.schedules import make_lr_schedule

    total = 37
    base = 3e-2
    kw = {} if power is None else {"poly_power": power}
    ref_lrs = _torch_iter_lrs(ref, schedule_type, base, total,
                              **({"poly_power": power} if power else {}))
    sched = make_lr_schedule(schedule_type, base, total, **kw)
    ours = np.array([float(sched(i)) for i in range(total)])
    # our schedule evaluates in f32 inside the jitted update; torch is f64
    np.testing.assert_allclose(ours, ref_lrs, rtol=1e-5)


def test_stepped_schedule_matches_reference(ref):
    import torch

    from cutmix_seg_tpu.core.schedules import make_lr_schedule

    base, gamma = 0.1, 0.3
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    ep_sched, _ = ref.lr_schedules.make_lr_schedulers(
        opt, 100, "stepped", "[3, 7]", gamma)
    ref_lrs = []
    import warnings

    for epoch_i in range(10):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ep_sched.step(epoch_i)  # trainer: :258-259
        ref_lrs.append(opt.param_groups[0]["lr"])

    iters_per_epoch = 5
    sched = make_lr_schedule("stepped", base, 100, step_epochs="[3, 7]",
                             step_gamma=gamma, iters_per_epoch=iters_per_epoch)
    ours = np.array([float(sched(e * iters_per_epoch)) for e in range(10)])
    np.testing.assert_allclose(ours, np.array(ref_lrs), rtol=1e-6)


# ---------------------------------------------------------------------- EMA

def test_ema_teacher_matches_reference_incl_bn_stats(ref):
    import torch

    from cutmix_seg_tpu.semisup.ema import ema_init, ema_update

    torch.manual_seed(0)

    def make_net():
        return torch.nn.Sequential(
            torch.nn.Conv2d(3, 4, 3, padding=1),
            torch.nn.BatchNorm2d(4),
            torch.nn.Conv2d(4, 2, 1),
        )

    student, teacher = make_net(), make_net()
    alpha = 0.99
    ema = ref.ema.EMAWeightOptimizer(teacher, student, alpha)

    def snapshot(net):
        return {k: v.detach().numpy().copy()
                for k, v in net.state_dict().items()
                if v.dtype == torch.float32}

    # our side: plain float pytrees driven by the SAME student trajectory
    our_teacher = ema_init(snapshot(student))

    rng = np.random.RandomState(0)
    for _ in range(5):
        # mutate student params AND its BN running stats (train-mode forward)
        with torch.no_grad():
            for p_t in student.parameters():
                p_t += torch.tensor(
                    rng.normal(0, 0.05, size=tuple(p_t.shape)),
                    dtype=torch.float32)
            student.train()(torch.tensor(
                rng.normal(size=(2, 3, 8, 8)), dtype=torch.float32))
        ema.step()
        our_teacher = ema_update(our_teacher, snapshot(student), alpha)

    ref_teacher = snapshot(teacher)
    assert set(ref_teacher) == set(our_teacher)
    for k in ref_teacher:
        np.testing.assert_allclose(
            np.asarray(our_teacher[k]), ref_teacher[k], rtol=0, atol=1e-7,
            err_msg=k)
    assert any("running_mean" in k for k in ref_teacher)  # stats covered


# -------------------------------------------------------------------- splits

def _png_bytes(arr):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def reference_env(tmp_path, ref, monkeypatch):
    """A reference-format cityscapes zip + config files wired into BOTH
    settings systems (theirs: settings._CONFIG_PATH; ours: CUTMIX_SEG_CONFIG)."""
    rng = np.random.RandomState(0)
    zpath = tmp_path / "cityscapes_segmentation.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for split, n in (("train", 9), ("val", 4)):
            for i in range(n):
                img = rng.randint(0, 255, (16, 32, 3), dtype=np.uint8)
                lab = rng.randint(0, 34, (16, 32), dtype=np.uint8)
                zf.writestr(f"{split}/sample{i}_x.png", _png_bytes(img))
                zf.writestr(f"{split}/sample{i}_y.png", _png_bytes(lab))
    cfg = tmp_path / "semantic_segmentation.cfg"
    cfg.write_text(f"[paths]\ncityscapes = {zpath}\n")

    import settings as ref_settings

    monkeypatch.setattr(ref_settings, "_CONFIG_PATH", str(cfg))
    monkeypatch.setattr(ref_settings, "_config__", None)
    monkeypatch.setattr(ref_settings, "dnnlib", None)
    monkeypatch.setenv("CUTMIX_SEG_CONFIG", str(cfg))
    from cutmix_seg_tpu.data import settings as our_settings

    monkeypatch.setattr(our_settings, "_config", None)
    yield tmp_path
    monkeypatch.setattr(our_settings, "_config", None)


@pytest.mark.parametrize("n_val,n_sup,n_unsup,use_split_pickle", [
    (-1, 4, -1, False),     # plain: split_rng permutation, all-unsup
    (3, 2, 4, False),       # holdout: val carved from train, val -> test
    (-1, 3, -1, True),      # pickled split: train_perm = identity
])
def test_cityscapes_split_bit_equal_reference(reference_env, ref, n_val,
                                              n_sup, n_unsup,
                                              use_split_pickle):
    from datapipe import datasets as ref_datasets

    from cutmix_seg_tpu.data import datasets as our_datasets

    split_path = None
    if use_split_pickle:
        perm = np.random.RandomState(7).permutation(9)
        split_path = os.path.join(str(reference_env), "split.pkl")
        with open(split_path, "wb") as f:
            pickle.dump(perm, f)

    r = ref_datasets.load_dataset("cityscapes", n_val, 131, n_sup, n_unsup,
                                  12345, split_path)
    o = our_datasets.load_dataset("cityscapes", n_val, 131, n_sup, n_unsup,
                                  12345, split_path)

    np.testing.assert_array_equal(o["sup_ndx"], r["sup_ndx"])
    np.testing.assert_array_equal(o["unsup_ndx"], r["unsup_ndx"])
    np.testing.assert_array_equal(o["val_ndx_tgt"], r["val_ndx_tgt"])
    if r["test_ndx_tgt"] is None:
        assert o["test_ndx_tgt"] is None
    else:
        np.testing.assert_array_equal(o["test_ndx_tgt"], r["test_ndx_tgt"])
    # the label CONTENT must agree too (34 -> 19-class void remap)
    ri = r["ds_src"].dataset(labels=True, mask=False, xf=False,
                             pipeline_type="cv")
    for i in [int(r["sup_ndx"][0]), int(r["val_ndx_tgt"][0])]:
        np.testing.assert_array_equal(
            o["ds_src"].get_labels(i),
            ri.get_labels_arr(i).astype(np.int32))
        np.testing.assert_array_equal(
            o["ds_src"].get_image(i), np.array(ri.get_image_pil(i)))
