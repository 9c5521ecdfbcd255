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

import json
import os
import pickle
import re
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
    try:
        import torchvision  # noqa: F401
    except ImportError:
        # the reference's deeplab2 imports torchvision.models.resnet at
        # module level but ResNetDeepLab itself never uses it (only the
        # pretrained-download factories do) — an empty stub unblocks
        # executing the model class
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvr = types.ModuleType("torchvision.models.resnet")
        tv.models = tvm
        tvm.resnet = tvr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.models.resnet"] = tvr

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


# ---------------------------------------------------- transform suite / warps

def _test_image(seed, h, w):
    """Smooth noise image + blobby labels (the reference tests' fixture idea)."""
    rng = np.random.RandomState(seed)
    img = rng.uniform(0, 255, size=(h, w, 3))
    for _ in range(2):  # cheap smoothing so bilinear differences are visible
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)
               + np.roll(img, -1, 0) + np.roll(img, -1, 1)) / 5.0
    labels = (img[..., 0] > img[..., 0].mean()).astype(np.uint8) * 3 + \
        (img[..., 1] > img[..., 1].mean()).astype(np.uint8)
    return img.astype(np.uint8), labels


_MEAN = np.array([0.485, 0.456, 0.406])
_STD = np.array([0.229, 0.224, 0.225])


def _run_reference_single(ref_cv, r_affine, xform, image, labels,
                          with_xf=False):
    """Reference chain: geometry (+flip) -> NormalizeToTensor, on the
    reference's sample-dict protocol.

    ``with_xf`` is only usable for geometry-only chains: the reference's
    RandomFlip.transform_single passes 1-D flip flags into
    affine.flip_xyd_matrices, which requires 2-D — a latent reference bug
    (seg_transforms_cv.py:491-495, affine.py:122-135) its trainers never
    hit because only the pair-mode aug_mt pipeline carries xf.
    """
    sample = {
        "image_arr": image.copy(),
        "labels_arr": labels.copy(),
        "mask_arr": np.full(image.shape[:2], 255, np.uint8),
    }
    if with_xf:
        sample["xf_cv"] = r_affine.identity_xf(1)[0]
    for t in xform:
        sample = t.apply(sample)
    norm = ref_cv.SegCVTransformNormalizeToTensor(_MEAN, _STD)
    out = norm.apply(sample)
    return out


def _run_ours_single(geom_cfg, image, labels, rng, border, separable):
    import jax.numpy as jnp

    from cutmix_seg_tpu.aug.device import augment_batch
    from cutmix_seg_tpu.aug.params import sample_geom_single

    h, w = image.shape[:2]
    ohw = geom_cfg.crop_size
    chh = max(h, ohw[0] * 2 + 4)
    cww = max(w, ohw[1] * 2 + 4)
    canvas = np.zeros((1, chh, cww, 3), np.uint8)
    canvas[0, :h, :w] = image
    lab_canvas = np.full((1, chh, cww), 255, np.uint8)
    lab_canvas[0, :h, :w] = labels
    m, interp = sample_geom_single(geom_cfg, (h, w), rng, True)
    out = augment_batch(
        jnp.asarray(canvas), jnp.asarray(lab_canvas),
        jnp.asarray(m[None]), jnp.asarray(np.array([[h, w]], np.int32)),
        jnp.asarray(np.array([interp], np.int32)),
        _MEAN, _STD, None, out_hw=ohw, with_labels=True, border=border,
        separable=separable)
    return m, out


@pytest.fixture(scope="module")
def ref_cv(ref):
    from datapipe import affine as r_affine
    from datapipe import seg_transforms_cv as cv_mod

    return types.SimpleNamespace(cv=cv_mod, affine=r_affine)


@pytest.mark.parametrize("mode,separable", [
    ("crop", False), ("crop", True),
    ("crop_scale_hung", False), ("crop_scale_hung", True),
])
def test_transform_single_matches_reference_cv(ref_cv, mode, separable):
    """Matrices bit-compare against the reference's composed xf_cv; warped
    pixels/labels/valid-mask compare against the reference's actual cv2
    output (uint8 fixed-point resize => small tolerance; plain crop mode is
    exact).  Covers both the gather and the MXU-separable device paths.
    (seg_transforms_cv.py:103-166,169-303,452-538,587-660)"""
    from cutmix_seg_tpu.aug.params import GeomConfig

    image, labels = _test_image(3, 120, 150)
    crop = (64, 57)
    geom = GeomConfig(crop_size=crop, mode=mode, hflip=True, vflip=True)

    import dataclasses

    geom_noflip = dataclasses.replace(geom, hflip=False, vflip=False)

    def make_geo(r_rng):
        if mode == "crop":
            return ref_cv.cv.SegCVTransformRandomCrop(crop, None, rng=r_rng)
        return ref_cv.cv.SegCVTransformRandomCropScaleHung(
            crop, None, rng=r_rng)

    for seed in (0, 1, 2, 3, 4):
        # matrices: geometry-only chain carries xf (the reference's flip
        # single+xf path is broken — see _run_reference_single)
        ref_geo = _run_reference_single(
            ref_cv.cv, ref_cv.affine,
            [make_geo(np.random.RandomState(100 + seed))], image, labels,
            with_xf=True)
        m_geo, _ = _run_ours_single(
            geom_noflip, image, labels, np.random.RandomState(100 + seed),
            "constant", separable)
        np.testing.assert_allclose(
            m_geo.astype(np.float64), ref_geo["xf_cv"], atol=1e-4,
            err_msg=f"xf mismatch mode={mode} seed={seed}")

        # pixels/labels/mask: full chain incl. flips, no xf
        r_rng = np.random.RandomState(100 + seed)
        o_rng = np.random.RandomState(100 + seed)
        geo_t = make_geo(r_rng)
        flip_t = ref_cv.cv.SegCVTransformRandomFlip(
            True, True, False, rng=r_rng)
        ref_out = _run_reference_single(
            ref_cv.cv, ref_cv.affine, [geo_t, flip_t], image, labels)
        m, ours = _run_ours_single(geom, image, labels, o_rng, "constant",
                                   separable)

        o_img = np.asarray(ours["image"])[0]           # HWC standardised
        r_img = ref_out["image"].transpose(1, 2, 0)    # CHW -> HWC
        o_lab = np.asarray(ours["labels"])[0]
        r_lab = ref_out["labels"][0]
        o_mask = np.asarray(ours["mask"])[0, :, :, 0]
        r_mask = ref_out["mask"][0]
        if mode == "crop":
            # integer-coordinate crop: exact
            np.testing.assert_allclose(o_img, r_img, atol=1e-5)
            np.testing.assert_array_equal(o_lab, r_lab)
            np.testing.assert_allclose(o_mask, r_mask, atol=1e-5)
        else:
            # cv2 resizes uint8 in fixed point; our warp is float. ~3/255
            # per-pixel on the standardised scale, tiny mean error, with a
            # <0.2% long tail of boundary taps reaching ~7/255.
            diff = np.abs(o_img - r_img)
            np.testing.assert_allclose(o_img, r_img, atol=0.16)
            assert (diff > 0.09).mean() < 0.002
            assert diff.mean() < 0.02
            np.testing.assert_allclose(o_mask, r_mask, atol=0.05)
            # LABEL QUIRK (documented divergence): the reference resizes
            # labels with cv2 INTER_NEAREST, whose non-centred nearest
            # mapping shifts label taps up to half a SOURCE pixel against
            # the centred geometry its own composed xf_cv records and its
            # IMAGE resize (INTER_LINEAR, centred) uses — the reference's
            # labels are geometrically inconsistent with its images by that
            # much (at f_scale=0.5 the shift is a full source pixel). We
            # warp labels consistently with the matrix instead. The bound
            # that must hold: every reference label value comes from within
            # one SOURCE pixel of our nearest tap (f64 geometry).
            inv = np.linalg.inv(np.vstack([m.astype(np.float64),
                                           [0.0, 0.0, 1.0]]))
            xs_d, ys_d = np.meshgrid(np.arange(crop[1]), np.arange(crop[0]))
            sx = inv[0, 0] * xs_d + inv[0, 1] * ys_d + inv[0, 2]
            sy = inv[1, 0] * xs_d + inv[1, 1] * ys_d + inv[1, 2]
            tx = np.floor(sx + 0.5).astype(int)
            ty = np.floor(sy + 0.5).astype(int)
            h_img, w_img = labels.shape
            ok = np.zeros(o_lab.shape, bool)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    cy = ty + dy
                    cx = tx + dx
                    inb = (cy >= 0) & (cy < h_img) & (cx >= 0) & (cx < w_img)
                    vals = np.where(
                        inb, labels[np.clip(cy, 0, h_img - 1),
                                    np.clip(cx, 0, w_img - 1)], 255)
                    ok |= vals == r_lab
            assert (~ok).mean() < 0.005, \
                f"reference labels beyond one source pixel (seed={seed})"


def test_transform_pair_matrices_match_reference_cv(ref_cv):
    """Pair mode (augmentation-driven consistency): both elements' composed
    matrices must match the reference's xf_cv pair, Hung pair scheme
    (seg_transforms_cv.py:232-303) + pair flips (:499-538)."""
    from cutmix_seg_tpu.aug.params import GeomConfig, sample_geom_pair

    image, labels = _test_image(5, 110, 130)
    crop = (48, 48)
    geom = GeomConfig(crop_size=crop, mode="crop_scale_hung",
                      crop_offset=(16, 16), hflip=True)

    for seed in (0, 1, 2):
        r_rng = np.random.RandomState(200 + seed)
        o_rng = np.random.RandomState(200 + seed)
        geo_t = ref_cv.cv.SegCVTransformRandomCropScaleHung(
            crop, (16, 16), rng=r_rng)
        flip_t = ref_cv.cv.SegCVTransformRandomFlip(True, False, False,
                                                    rng=r_rng)
        sample = {
            "image_arr": image.copy(),
            "labels_arr": labels.copy(),
            "mask_arr": np.full(image.shape[:2], 255, np.uint8),
            "xf_cv": ref_cv.affine.identity_xf(1)[0],
        }
        pair = ref_cv.cv.SegTransformToPair().apply(sample) \
            if hasattr(ref_cv.cv, "SegTransformToPair") else None
        if pair is None:
            from datapipe import seg_transforms

            pair = seg_transforms.SegTransformToPair().apply(sample)
        pair = geo_t.apply(pair)
        pair = flip_t.apply(pair)

        (m0, i0), (m1, i1) = sample_geom_pair(
            geom, image.shape[:2], o_rng, True)
        np.testing.assert_allclose(
            m0.astype(np.float64), pair["sample0"]["xf_cv"], atol=1e-4,
            err_msg=f"m0 seed={seed}")
        np.testing.assert_allclose(
            m1.astype(np.float64), pair["sample1"]["xf_cv"], atol=1e-4,
            err_msg=f"m1 seed={seed}")


def test_rotate_scale_transform_matches_reference_cv(ref_cv):
    """crop_rotate_scale family (ISIC recipe): reference warps with
    cv2.warpAffine (reflect101 border for the image, constant 255 for
    labels; nearest for both when labels ride along) — compare our gather
    path's output (seg_transforms_cv.py:306-450)."""
    from cutmix_seg_tpu.aug.params import GeomConfig

    image, labels = _test_image(7, 100, 120)
    crop = (64, 64)
    geom = GeomConfig(crop_size=crop, mode="crop_rotate_scale",
                      rot_mag_deg=45.0, max_scale=1.1, hflip=True,
                      vflip=True, hvflip=True)

    import dataclasses

    geom_noflip = dataclasses.replace(geom, hflip=False, vflip=False,
                                      hvflip=False)
    agree_img, agree_lab, n_px = 0, 0, 0
    for seed in (0, 1, 2, 3, 4):
        # matrices: geometry-only chain with xf (flip single+xf is broken
        # in the reference — see _run_reference_single)
        ref_geo = _run_reference_single(
            ref_cv.cv, ref_cv.affine,
            [ref_cv.cv.SegCVTransformRandomCropRotateScale(
                crop, None, rot_mag=45.0, max_scale=1.1, uniform_scale=True,
                rng=np.random.RandomState(300 + seed))],
            image, labels, with_xf=True)
        m_geo, _ = _run_ours_single(
            geom_noflip, image, labels, np.random.RandomState(300 + seed),
            "reflect101", separable=False)
        np.testing.assert_allclose(
            m_geo.astype(np.float64), ref_geo["xf_cv"], atol=1e-4,
            err_msg=f"xf mismatch seed={seed}")

        r_rng = np.random.RandomState(300 + seed)
        o_rng = np.random.RandomState(300 + seed)
        geo_t = ref_cv.cv.SegCVTransformRandomCropRotateScale(
            crop, None, rot_mag=45.0, max_scale=1.1, uniform_scale=True,
            rng=r_rng)
        flip_t = ref_cv.cv.SegCVTransformRandomFlip(True, True, True,
                                                    rng=r_rng)
        ref_out = _run_reference_single(
            ref_cv.cv, ref_cv.affine, [geo_t, flip_t], image, labels)
        m, ours = _run_ours_single(geom, image, labels, o_rng, "reflect101",
                                   separable=False)
        o_img = np.asarray(ours["image"])[0]
        r_img = ref_out["image"].transpose(1, 2, 0)
        o_lab = np.asarray(ours["labels"])[0]
        r_lab = ref_out["labels"][0]
        # nearest-vs-nearest: identical except fixed-point boundary taps
        agree_img += (np.abs(o_img - r_img) < 1e-3).mean()
        agree_lab += (o_lab == r_lab).mean()
        n_px += 1
    assert agree_img / n_px > 0.95, agree_img / n_px
    assert agree_lab / n_px > 0.95, agree_lab / n_px


def test_cv_to_grid_matches_reference_converter(ref_cv):
    """The cv-pixel-space -> torch grid-sample coordinate converter is the
    reference's most error-prone component (its whole test suite exists for
    it; SURVEY hard-part #1). Compare our cv_to_grid against the reference's
    executable cv_to_torch on random affine matrices, square and non-square,
    with and without distinct src sizes (datapipe/affine.py:185-232)."""
    from cutmix_seg_tpu.aug import affine as our_affine

    rng = np.random.RandomState(0)
    for _ in range(20):
        n = 3
        m = np.zeros((n, 2, 3))
        th = rng.uniform(-1.2, 1.2, n)
        s = rng.uniform(0.5, 2.0, (n, 2))
        m[:, 0, 0] = np.cos(th) * s[:, 0]
        m[:, 0, 1] = -np.sin(th) * s[:, 1]
        m[:, 1, 0] = np.sin(th) * s[:, 0]
        m[:, 1, 1] = np.cos(th) * s[:, 1]
        m[:, :, 2] = rng.uniform(-30, 30, (n, 2))
        dst = (int(rng.randint(8, 60)), int(rng.randint(8, 60)))
        src = (int(rng.randint(8, 60)), int(rng.randint(8, 60)))

        r_same = ref_cv.affine.cv_to_torch(m, dst)
        o_same = our_affine.cv_to_grid(m, dst)
        np.testing.assert_allclose(o_same, r_same, rtol=1e-10, atol=1e-12)

        r_diff = ref_cv.affine.cv_to_torch(m, dst, src)
        o_diff = our_affine.cv_to_grid(m, dst, src)
        np.testing.assert_allclose(o_diff, r_diff, rtol=1e-10, atol=1e-12)


# ------------------------------------------- trainer-trajectory differential

@pytest.mark.slow
def test_mask_mt_step_trajectory_matches_reference_trainer(ref):
    """THE trainer differential: the reference's CutMix mean-teacher inner
    loop — executed with the reference's OWN model class (ResNetDeepLab on a
    reduced layer config), its EMAWeightOptimizer, torch Adam with its
    two-LR param groups, and the trainer's literal loss/gate/mix math
    (train_seg_semisup_mask_mt.py:266-275,287-467) — against this
    framework's single fused step, from IDENTICAL imported initial weights,
    identical batches and identical CutMix masks, for 8 optimizer steps.

    Losses, conf rates and final parameters must track to f32 tolerance;
    this proves end-to-end that one jitted XLA program computes the same
    training trajectory as the reference's many-kernel torch loop."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    import jax
    import jax.numpy as jnp
    from architectures import deeplab2 as r_dl

    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        ModelState,
        OptimizerConfig,
        TrainState,
        create_train_state,
    )
    from cutmix_seg_tpu.masks.box_mask import sample_masks
    from cutmix_seg_tpu.models import torch_import
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.semisup.mask_mt import (
        MaskConsistencyConfig,
        make_mask_mt_step,
    )

    C, layers, HW, B = 4, (1, 1, 1, 1), 48, 3
    LR, ALPHA, CW, CONF = 2e-3, 0.99, 1.0, 0.25
    N_STEPS = 8

    # ---- reference side: its own model class, reduced depth ----
    torch.manual_seed(0)
    stu_t = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C, None, None)
    tea_t = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C, None, None)
    for p in tea_t.parameters():
        p.requires_grad = False
    # NOTE: the raw reference optimizer construction
    # (train_seg_semisup_mask_mt.py:90-92) passes pretrained_parameters()
    # UNDEDUPED — deep backbone params appear 3-4x (recursive modules() x
    # recursive parameters(); deeplab2.py:215-230) and torch applies the
    # Adam update once PER ENTRY. That accidental 3-4x update multiplier is
    # pinned by test_reference_optimizer_duplicate_param_quirk below and
    # consciously NOT reproduced (this framework updates each parameter
    # once); the trajectory comparison dedupes the reference side.
    seen = set()
    pre_dedup = [p for p in stu_t.pretrained_parameters()
                 if id(p) not in seen and not seen.add(id(p))]
    student_optim = torch.optim.Adam([
        dict(params=pre_dedup, lr=LR * 0.1),
        dict(params=stu_t.new_parameters(), lr=LR)])
    teacher_optim = ref.ema.EMAWeightOptimizer(tea_t, stu_t, ALPHA)
    stu_t.train()
    tea_t.train()
    stu_t.freeze_batchnorm()
    tea_t.freeze_batchnorm()
    clf_crossent_loss = nn.CrossEntropyLoss(ignore_index=255)

    # ---- our side: same weights via the torch importer ----
    model = SegModel(
        name="deeplab2_tiny", module=DeepLab2(num_classes=C, layers=layers),
        mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
        param_label=_param_label, load_pretrained=None)
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=LR,
        lr_schedule=make_lr_schedule("none", LR, 1000))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(7), input_hw=(HW, HW),
        mean_teacher=True, pretrained=False)

    # .copy() is load-bearing: torch .numpy() shares memory with the live
    # tensors and JAX CPU arrays can alias numpy buffers — without it the
    # torch optimizer's in-place updates would mutate OUR parameters
    sd = {k: v.numpy().copy() for k, v in stu_t.state_dict().items()}
    params_u, stats_u = torch_import.map_torch_resnet(sd)
    head_u = torch_import.map_hung_deeplab_classifier(sd)
    variables = {"params": state.student.params,
                 "batch_stats": state.student.batch_stats}
    variables, n1, skipped1 = torch_import.merge_updates(
        variables, {"backbone": params_u}, {"backbone": stats_u})
    variables, n2, skipped2 = torch_import.merge_updates(
        variables, {"classifier": head_u}, {})
    assert skipped1 == 0 and skipped2 == 0
    params = variables["params"]
    stats = variables["batch_stats"]
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = TrainState(
        step=state.step,
        student=ModelState(params=params, batch_stats=stats),
        teacher=ModelState(params=copy(params), batch_stats=copy(stats)),
        opt_state=tx.init(params),
        rng=state.rng,
    )

    cfg = MaskConsistencyConfig(
        mask_mode="mix", cons_loss_fn="var", cons_weight=CW,
        conf_thresh=CONF, conf_per_pixel=False, freeze_bn=True,
        mean_teacher=True, teacher_alpha=ALPHA, pallas_cutmix="off")
    step = jax.jit(make_mask_mt_step(model, tx, cfg))

    rng = np.random.RandomState(0)

    def rand_batch():
        b = {
            "sup_x": rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32),
            "sup_y": rng.randint(0, C, (B, HW, HW)).astype(np.int32),
        }
        b["sup_y"][b["sup_y"] == 0] = np.where(
            rng.uniform(size=(b["sup_y"] == 0).sum()) < 0.3, 255, 0)
        for k in ("ux0", "ux1"):
            x = rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32)
            b[f"{k}_tea"] = x
            b[f"{k}_stu"] = x
        for k in ("um0", "um1"):
            um = np.ones((B, HW, HW, 1), np.float32)
            y0, x0 = rng.randint(0, HW, 2)
            um[:, y0:, x0:] = 0.0  # partial validity exercises loss_mask
            b[k] = um
        return b

    t = lambda a: torch.tensor(np.transpose(a, (0, 3, 1, 2)))

    ref_sup, ref_cons, ref_conf = [], [], []
    our_sup, our_cons, our_conf = [], [], []
    for it in range(N_STEPS):
        batch = rand_batch()
        # our step samples its mask from state.rng's split — reproduce it so
        # the reference loop consumes the IDENTICAL masks
        k_mask = jax.random.split(state.rng, 5)[1]
        masks = np.asarray(sample_masks(cfg.box, k_mask, B, (HW, HW),
                                        dtype=jnp.float32))  # (B, H, W, 1)

        # ---- the reference's literal iteration ----
        student_optim.zero_grad()
        logits_sup = stu_t(t(batch["sup_x"]))
        sup_loss = clf_crossent_loss(
            logits_sup, torch.tensor(batch["sup_y"].astype(np.int64)))
        sup_loss.backward()

        m_t = torch.tensor(np.transpose(masks, (0, 3, 1, 2)))
        ux_mixed = t(batch["ux0_stu"]) * (1 - m_t) + t(batch["ux1_stu"]) * m_t
        um_mixed = (torch.tensor(np.transpose(batch["um0"], (0, 3, 1, 2)))
                    * (1 - m_t)
                    + torch.tensor(np.transpose(batch["um1"], (0, 3, 1, 2)))
                    * m_t)
        with torch.no_grad():
            logits_u0 = tea_t(t(batch["ux0_tea"])).detach()
            logits_u1 = tea_t(t(batch["ux1_tea"])).detach()
        logits_stu = stu_t(ux_mixed)
        logits_tea = logits_u0 * (1 - m_t) + logits_u1 * m_t
        prob_tea = F.softmax(logits_tea, dim=1)
        prob_stu = F.softmax(logits_stu, dim=1)
        conf_tea = prob_tea.max(dim=1)[0]
        conf_mask = (conf_tea >= CONF).float()[:, None, :, :]
        ref_conf.append(float(conf_mask.mean()))
        loss_mask = um_mixed * conf_mask.mean()
        delta = prob_stu - prob_tea
        cons = (delta * delta).sum(dim=1, keepdim=True)
        cons = (cons * loss_mask).mean()
        (cons * CW).backward()
        student_optim.step()
        teacher_optim.step()
        ref_sup.append(float(sup_loss.detach()))
        ref_cons.append(float(cons.detach()))

        # ---- our fused step on the same batch ----
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()},
                              jnp.float32(1.0))
        our_sup.append(float(metrics["sup_loss"]))
        our_cons.append(float(metrics["cons_loss"]))
        our_conf.append(float(metrics["conf_rate"]))

    np.testing.assert_allclose(our_sup, ref_sup, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_cons, ref_cons, rtol=5e-3, atol=2e-5)
    np.testing.assert_allclose(our_conf, ref_conf, rtol=0, atol=2e-3)

    # final parameters track: student classifier + a deep backbone conv +
    # the EMA teacher's copies
    fin = stu_t.state_dict()
    our_p = state.student.params
    our_t = state.teacher.params
    ref_w = fin["layer5.conv2d_list.0.weight"].numpy()
    our_w = np.asarray(
        our_p["classifier"]["aspp0"]["kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(our_w, ref_w, atol=5e-4)
    ref_c1 = fin["conv1.weight"].numpy()
    our_c1 = np.asarray(
        our_p["backbone"]["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(our_c1, ref_c1, atol=5e-4)
    tea_fin = tea_t.state_dict()
    np.testing.assert_allclose(
        np.asarray(our_t["classifier"]["aspp0"]["kernel"]).transpose(3, 2, 0, 1),
        tea_fin["layer5.conv2d_list.0.weight"].numpy(), atol=5e-4)


def test_reference_optimizer_duplicate_param_quirk(ref):
    """Documents (by execution) a reference behaviour consciously NOT
    reproduced: pretrained_parameters() iterates modules() recursively and
    yields each module's parameters() (also recursive), so deep backbone
    parameters appear once per ancestor module in the Adam group
    (deeplab2.py:215-230, train_seg_semisup_mask_mt.py:90-92) — and torch
    applies the update once PER ENTRY (pytorch#40967). The reference
    therefore trained its headline backbone with an effective 3-4x update
    multiplier. This framework updates every parameter exactly once."""
    import collections

    import torch
    from architectures import deeplab2 as r_dl

    torch.manual_seed(0)
    net = r_dl.ResNetDeepLab(r_dl.Bottleneck, [1, 1, 1, 1], 4, None, None)
    pre = list(net.pretrained_parameters())
    mult = collections.Counter(
        collections.Counter(id(p) for p in pre).values())
    assert dict(mult) == {1: 1, 3: 12, 4: 4}  # conv1 once; stage convs 3-4x
    new = list(net.new_parameters())
    assert len(new) == len({id(p) for p in new})  # head params are unique

    # torch really does apply duplicated entries multiple times
    p = torch.nn.Parameter(torch.zeros(2))
    opt = torch.optim.Adam([dict(params=[p, p], lr=0.1)])
    p.grad = torch.ones(2)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        opt.step()
    np.testing.assert_allclose(p.detach().numpy(), [-0.2, -0.2], atol=1e-6)


@pytest.fixture
def reference_env_more(tmp_path, ref, monkeypatch):
    """CamVid (dir/annot-dir layout) + ISIC (x/y + rgb_mean_std.pkl) zips
    wired into both settings systems."""
    rng = np.random.RandomState(1)
    cam = tmp_path / "CamVidData.zip"
    with zipfile.ZipFile(cam, "w") as zf:
        for split, n in (("train", 7), ("val", 3), ("test", 2)):
            for i in range(n):
                img = rng.randint(0, 255, (16, 24, 3), dtype=np.uint8)
                lab = rng.randint(0, 12, (16, 24), dtype=np.uint8)
                zf.writestr(f"{split}/s{i}.png", _png_bytes(img))
                zf.writestr(f"{split}annot/s{i}.png", _png_bytes(lab))
    isic = tmp_path / "isic2017_segmentation.zip"
    with zipfile.ZipFile(isic, "w") as zf:
        for split, n in (("train", 8), ("val", 4)):
            for i in range(n):
                img = rng.randint(0, 255, (20, 20, 3), dtype=np.uint8)
                lab = (rng.uniform(size=(20, 20)) * 255).astype(np.uint8)
                zf.writestr(f"{split}/img{i}_x.png", _png_bytes(img))
                zf.writestr(f"{split}/img{i}_y.png", _png_bytes(lab))
        zf.writestr("rgb_mean_std.pkl", pickle.dumps(
            {"rgb_mean": np.array([0.5, 0.4, 0.3]),
             "rgb_std": np.array([0.2, 0.2, 0.2])}))
    cfg = tmp_path / "semantic_segmentation.cfg"
    cfg.write_text(f"[paths]\ncamvid = {cam}\nisic2017 = {isic}\n")

    import settings as ref_settings

    monkeypatch.setattr(ref_settings, "_CONFIG_PATH", str(cfg))
    monkeypatch.setattr(ref_settings, "_config__", None)
    monkeypatch.setattr(ref_settings, "dnnlib", None)
    monkeypatch.setenv("CUTMIX_SEG_CONFIG", str(cfg))
    from cutmix_seg_tpu.data import settings as our_settings

    monkeypatch.setattr(our_settings, "_config", None)
    yield tmp_path
    monkeypatch.setattr(our_settings, "_config", None)


@pytest.mark.parametrize("n_val", [-1, 2])
def test_camvid_split_bit_equal_reference(reference_env_more, ref, n_val):
    """CamVid: dir/annot-dir zip layout, official train/val/test splits,
    n_val SUBSAMPLES val (no holdout carving), labels 11 -> 255, median-freq
    class weights (camvid_dataset.py:21-79)."""
    from datapipe import datasets as ref_datasets

    from cutmix_seg_tpu.data import datasets as our_datasets

    r = ref_datasets.load_dataset("camvid", n_val, 131, 3, -1, 12345, None)
    o = our_datasets.load_dataset("camvid", n_val, 131, 3, -1, 12345, None)
    for k in ("sup_ndx", "unsup_ndx", "val_ndx_tgt", "test_ndx_tgt"):
        np.testing.assert_array_equal(o[k], r[k], err_msg=k)
    np.testing.assert_allclose(o["ds_src"].class_weights,
                               r["ds_src"].class_weights, rtol=1e-12)
    ri = r["ds_src"].dataset(labels=True, mask=False, xf=False,
                             pipeline_type="cv")
    i = int(r["sup_ndx"][0])
    np.testing.assert_array_equal(o["ds_src"].get_labels(i),
                                  ri.get_labels_arr(i).astype(np.int32))
    np.testing.assert_array_equal(o["ds_src"].get_image(i),
                                  np.array(ri.get_image_pil(i)))


@pytest.mark.parametrize("n_val", [-1, 3])
def test_isic_split_bit_equal_reference(reference_env_more, ref, n_val):
    """ISIC2017: x/y zip, img>=127 binary labels, per-dataset mean/std from
    rgb_mean_std.pkl, holdout semantics (isic2017_dataset.py:31-90)."""
    from datapipe import datasets as ref_datasets

    from cutmix_seg_tpu.data import datasets as our_datasets

    r = ref_datasets.load_dataset("isic2017", n_val, 131, 4, -1, 12345, None)
    o = our_datasets.load_dataset("isic2017", n_val, 131, 4, -1, 12345, None)
    for k in ("sup_ndx", "unsup_ndx", "val_ndx_tgt"):
        np.testing.assert_array_equal(o[k], r[k], err_msg=k)
    if r["test_ndx_tgt"] is None:
        assert o["test_ndx_tgt"] is None
    else:
        np.testing.assert_array_equal(o["test_ndx_tgt"], r["test_ndx_tgt"])
    np.testing.assert_allclose(np.asarray(o["ds_src"].get_mean_std()),
                               np.asarray(r["ds_src"].get_mean_std()),
                               rtol=1e-12)
    ri = r["ds_src"].dataset(labels=True, mask=False, xf=False,
                             pipeline_type="cv")
    i = int(r["sup_ndx"][0])
    np.testing.assert_array_equal(o["ds_src"].get_labels(i),
                                  ri.get_labels_arr(i).astype(np.int32))


def test_consistency_loss_menu_matches_reference_formulas(ref):
    """The five consistency losses vs the reference trainer's literal inline
    formulas (train_seg_semisup_mask_mt.py:428-448), executing the
    reference's own robust_binary_crossentropy and torch's F.* ops."""
    import torch
    import torch.nn.functional as F

    from architectures import network_architectures

    from cutmix_seg_tpu.semisup.losses import consistency_loss_per_pixel

    rng = np.random.RandomState(0)
    n, h, w, c = 2, 9, 11, 5
    ls = rng.normal(0, 2, (n, h, w, c)).astype(np.float32)
    lt = rng.normal(0, 2, (n, h, w, c)).astype(np.float32)
    t_ls = torch.tensor(np.transpose(ls, (0, 3, 1, 2)))
    t_lt = torch.tensor(np.transpose(lt, (0, 3, 1, 2)))
    prob_stu = F.softmax(t_ls, dim=1)
    prob_tea = F.softmax(t_lt, dim=1)
    root_c = float(np.sqrt(c))

    def ref_loss(name):
        if name == "var":
            d = prob_stu - prob_tea
            out = (d * d).sum(dim=1, keepdim=True)
        elif name == "logits_var":
            d = t_ls - t_lt
            out = (d * d).sum(dim=1, keepdim=True) / root_c
        elif name == "logits_smoothl1":
            out = F.smooth_l1_loss(t_ls, t_lt, reduction="none")
            out = out.sum(dim=1, keepdim=True) / root_c
        elif name == "bce":
            out = network_architectures.robust_binary_crossentropy(
                prob_stu, prob_tea)
            out = out.sum(dim=1, keepdim=True)
        elif name == "kld":
            out = F.kl_div(F.log_softmax(t_ls, dim=1), prob_tea,
                           reduction="none")
            out = out.sum(dim=1, keepdim=True)
        return out.numpy().transpose(0, 2, 3, 1)

    for name in ("var", "logits_var", "logits_smoothl1", "bce", "kld"):
        ours = np.asarray(consistency_loss_per_pixel(name, ls, lt))
        np.testing.assert_allclose(ours, ref_loss(name), rtol=2e-5,
                                   atol=1e-6, err_msg=name)


def test_sigmoid_rampup_matches_reference(ref):
    """exp(-5(1-t)^2) consistency ramp (network_architectures.py:122-130)."""
    from architectures import network_architectures

    from cutmix_seg_tpu.utils.rampup import sigmoid_rampup

    for epoch in (0, 1, 3, 7, 11, 15, 20):
        ours = float(sigmoid_rampup(epoch, 15))
        theirs = float(network_architectures.sigmoid_rampup(epoch, 15))
        np.testing.assert_allclose(ours, theirs, rtol=1e-6,
                                   err_msg=str(epoch))


@pytest.fixture
def pascal_env(tmp_path, ref, monkeypatch):
    """Synthetic loose-file VOC2012 tree + config for both settings systems."""
    scripts_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        from tpu_e2e_voc import make_voc_tree
    finally:
        sys.path.remove(scripts_dir)

    root = tmp_path / "VOC2012"
    make_voc_tree(str(root), n_train=10, n_val=4)
    cfg = tmp_path / "semantic_segmentation.cfg"
    cfg.write_text(f"[paths]\npascal_voc = {root}\n")

    import settings as ref_settings

    monkeypatch.setattr(ref_settings, "_CONFIG_PATH", str(cfg))
    monkeypatch.setattr(ref_settings, "_config__", None)
    monkeypatch.setattr(ref_settings, "dnnlib", None)
    monkeypatch.setenv("CUTMIX_SEG_CONFIG", str(cfg))
    from cutmix_seg_tpu.data import settings as our_settings

    monkeypatch.setattr(our_settings, "_config", None)
    yield root
    monkeypatch.setattr(our_settings, "_config", None)


@pytest.mark.parametrize("n_val", [-1, 3])
def test_pascal_split_bit_equal_reference(pascal_env, ref, n_val):
    """Pascal loose-file source: name-list ordering (train_ndx follows
    train.txt ORDER over sorted sample names), holdout semantics, labels and
    JPEG image content (pascal_voc_dataset.py:46-160)."""
    from datapipe import datasets as ref_datasets

    from cutmix_seg_tpu.data import datasets as our_datasets

    r = ref_datasets.load_dataset("pascal", n_val, 131, 4, -1, 12345, None)
    o = our_datasets.load_dataset("pascal", n_val, 131, 4, -1, 12345, None)
    for k in ("sup_ndx", "unsup_ndx", "val_ndx_tgt"):
        np.testing.assert_array_equal(o[k], r[k], err_msg=k)
    ri = r["ds_src"].dataset(labels=True, mask=False, xf=False,
                             pipeline_type="cv")
    i = int(r["sup_ndx"][0])
    np.testing.assert_array_equal(o["ds_src"].get_labels(i),
                                  ri.get_labels_arr(i).astype(np.int32))
    np.testing.assert_array_equal(o["ds_src"].get_image(i),
                                  np.array(ri.get_image_pil(i)))


def test_pascal_fg_subset_matches_reference_modulo_crash(pascal_env, ref):
    """The reference's fg_class_subset path CRASHES as written: it reads
    self.class_weights (pascal_voc_dataset.py:138) which the Pascal source
    never defines — a latent AttributeError documented here by execution.
    With that attribute patched in, the remaining logic (valid-image scan,
    cached pickle, index filtering, class_map remap) must match ours."""
    import numpy as _np

    from datapipe import pascal_voc_dataset as ref_pv

    from cutmix_seg_tpu.data import sources as our_sources

    with pytest.raises(AttributeError):
        ref_pv.PascalVOCDataSource(
            n_val=-1, val_rng=np.random.RandomState(131),
            trainval_perm=None, fg_class_subset=[5, 9])

    # patch the missing attribute at class level so the rest executes
    ref_pv.PascalVOCDataSource.class_weights = _np.ones(21)
    try:
        r = ref_pv.PascalVOCDataSource(
            n_val=-1, val_rng=np.random.RandomState(131),
            trainval_perm=None, fg_class_subset=[5, 9])
    finally:
        del ref_pv.PascalVOCDataSource.class_weights
    o = our_sources.PascalVOCDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        fg_class_subset=[5, 9], root=str(pascal_env))

    np.testing.assert_array_equal(o.train_ndx, r.train_ndx)
    np.testing.assert_array_equal(o.val_ndx, r.val_ndx)
    assert o.num_classes == r.num_classes == 3
    np.testing.assert_array_equal(o.class_map, r.class_map)
    # both sides share the reference's cached valid-index pickle contract
    cache = os.path.join(str(pascal_env), "valid_images_fg_subset_5-9.pkl")
    assert os.path.exists(cache)
    o2 = our_sources.PascalVOCDataSource(
        n_val=-1, val_rng=np.random.RandomState(131), trainval_perm=None,
        fg_class_subset=[5, 9], root=str(pascal_env))
    np.testing.assert_array_equal(o2.train_ndx, o.train_ndx)


# ------------------------------------------------ ICT trainer differential

@pytest.mark.slow
def test_ict_step_trajectory_matches_reference_trainer(ref):
    """Second trainer-trajectory differential: the reference's ICT inner
    loop — its OWN ResNetDeepLab, EMAWeightOptimizer, two-LR Adam, and the
    trainer's literal Beta-blend math (per-sample lambda mixes the student
    input, the teacher's logits, probs AND per-pixel confidences;
    train_seg_semisup_ict.py:290-395) — against this framework's fused ICT
    step, from identical imported weights, identical batches and IDENTICAL
    Beta draws, for 8 optimizer steps."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    import jax
    import jax.numpy as jnp
    from architectures import deeplab2 as r_dl

    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        ModelState,
        OptimizerConfig,
        TrainState,
        create_train_state,
    )
    from cutmix_seg_tpu.models import torch_import
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.semisup.ict import ICTConfig, make_ict_step

    C, layers, HW, B = 4, (1, 1, 1, 1), 48, 3
    LR, ALPHA, CW, CONF, ICT_A = 2e-3, 0.99, 1.0, 0.25, 0.1
    N_STEPS = 8

    torch.manual_seed(1)
    stu_t = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C, None, None)
    tea_t = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C, None, None)
    for p in tea_t.parameters():
        p.requires_grad = False
    # dedupe the reference's duplicated pretrained entries (the quirk is
    # pinned by test_reference_optimizer_duplicate_param_quirk)
    seen = set()
    pre_dedup = [p for p in stu_t.pretrained_parameters()
                 if id(p) not in seen and not seen.add(id(p))]
    student_optim = torch.optim.Adam([
        dict(params=pre_dedup, lr=LR * 0.1),
        dict(params=stu_t.new_parameters(), lr=LR)])
    teacher_optim = ref.ema.EMAWeightOptimizer(tea_t, stu_t, ALPHA)
    stu_t.train()
    tea_t.train()
    stu_t.freeze_batchnorm()
    tea_t.freeze_batchnorm()
    clf_crossent_loss = nn.CrossEntropyLoss(ignore_index=255)

    model = SegModel(
        name="deeplab2_tiny", module=DeepLab2(num_classes=C, layers=layers),
        mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
        param_label=_param_label, load_pretrained=None)
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=LR,
        lr_schedule=make_lr_schedule("none", LR, 1000))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(11), input_hw=(HW, HW),
        mean_teacher=True, pretrained=False)

    sd = {k: v.numpy().copy() for k, v in stu_t.state_dict().items()}
    params_u, stats_u = torch_import.map_torch_resnet(sd)
    head_u = torch_import.map_hung_deeplab_classifier(sd)
    variables = {"params": state.student.params,
                 "batch_stats": state.student.batch_stats}
    variables, _, sk1 = torch_import.merge_updates(
        variables, {"backbone": params_u}, {"backbone": stats_u})
    variables, _, sk2 = torch_import.merge_updates(
        variables, {"classifier": head_u}, {})
    assert sk1 == 0 and sk2 == 0
    params = variables["params"]
    stats = variables["batch_stats"]
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = TrainState(
        step=state.step,
        student=ModelState(params=params, batch_stats=stats),
        teacher=ModelState(params=copy(params), batch_stats=copy(stats)),
        opt_state=tx.init(params),
        rng=state.rng,
    )

    cfg = ICTConfig(
        ict_alpha=ICT_A, cons_loss_fn="var", cons_weight=CW,
        conf_thresh=CONF, conf_per_pixel=False, freeze_bn=True,
        mean_teacher=True, teacher_alpha=ALPHA)
    step = jax.jit(make_ict_step(model, tx, cfg))

    rng = np.random.RandomState(3)

    def rand_batch():
        b = {
            "sup_x": rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32),
            "sup_y": rng.randint(0, C, (B, HW, HW)).astype(np.int32),
        }
        b["sup_y"][b["sup_y"] == 0] = np.where(
            rng.uniform(size=(b["sup_y"] == 0).sum()) < 0.3, 255, 0)
        for k in ("ux0", "ux1"):
            x = rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32)
            b[f"{k}_tea"] = x
            b[f"{k}_stu"] = x
        for k in ("um0", "um1"):
            um = np.ones((B, HW, HW, 1), np.float32)
            y0, x0 = rng.randint(0, HW, 2)
            um[:, y0:, x0:] = 0.0
            b[k] = um
        return b

    t = lambda a: torch.tensor(np.transpose(a, (0, 3, 1, 2)))

    ref_sup, ref_cons, ref_conf = [], [], []
    our_sup, our_cons, our_conf = [], [], []
    for it in range(N_STEPS):
        batch = rand_batch()
        # our step draws lambda from split(state.rng, 5)[1]; reproduce the
        # IDENTICAL Beta draws for the reference loop
        k_beta = jax.random.split(state.rng, 5)[1]
        lam = np.asarray(jax.random.beta(
            k_beta, ICT_A, ICT_A, shape=(B, 1, 1, 1)), dtype=np.float32)

        # ---- the reference's literal ICT iteration ----
        student_optim.zero_grad()
        logits_sup = stu_t(t(batch["sup_x"]))
        sup_loss = clf_crossent_loss(
            logits_sup, torch.tensor(batch["sup_y"].astype(np.int64)))
        sup_loss.backward()

        lam_t = torch.tensor(lam)  # (B, 1, 1, 1) — NCHW-broadcastable as-is
        ux_mixed = t(batch["ux0_stu"]) * (1.0 - lam_t) \
            + t(batch["ux1_stu"]) * lam_t
        um_mixed = (torch.tensor(np.transpose(batch["um0"], (0, 3, 1, 2)))
                    * (1.0 - lam_t)
                    + torch.tensor(np.transpose(batch["um1"], (0, 3, 1, 2)))
                    * lam_t)
        with torch.no_grad():
            logits_u0 = tea_t(t(batch["ux0_tea"])).detach()
            logits_u1 = tea_t(t(batch["ux1_tea"])).detach()
        logits_stu = stu_t(ux_mixed)
        prob_u0 = F.softmax(logits_u0, dim=1)
        prob_u1 = F.softmax(logits_u1, dim=1)
        prob_stu = F.softmax(logits_stu, dim=1)
        prob_tea = prob_u0 * (1 - lam_t) + prob_u1 * lam_t
        conf_u0 = prob_u0.max(dim=1, keepdim=True)[0]
        conf_u1 = prob_u1.max(dim=1, keepdim=True)[0]
        conf_tea = conf_u0 * (1 - lam_t) + conf_u1 * lam_t
        conf_mask = (conf_tea >= CONF).float()
        ref_conf.append(float(conf_mask.mean()))
        loss_mask = um_mixed * conf_mask.mean()
        delta = prob_stu - prob_tea
        cons = (delta * delta).sum(dim=1, keepdim=True)
        cons = (cons * loss_mask).mean()
        (cons * CW).backward()
        student_optim.step()
        teacher_optim.step()
        ref_sup.append(float(sup_loss.detach()))
        ref_cons.append(float(cons.detach()))

        # ---- our fused ICT step on the same batch ----
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()},
                              jnp.float32(1.0))
        our_sup.append(float(metrics["sup_loss"]))
        our_cons.append(float(metrics["cons_loss"]))
        our_conf.append(float(metrics["conf_rate"]))

    np.testing.assert_allclose(our_sup, ref_sup, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_cons, ref_cons, rtol=5e-3, atol=2e-5)
    np.testing.assert_allclose(our_conf, ref_conf, rtol=0, atol=2e-3)

    # final parameters track on both sides of the EMA (atol slightly wider
    # than the mask_mt differential: ICT's extreme Beta(0.1, 0.1) lambdas
    # amplify f32 order-of-operations divergence through the blended
    # softmax targets — measured 7/73728 elements past 5e-4 at step 8, all
    # below 1e-3, with the losses tracking at 5e-3 rtol throughout)
    fin = stu_t.state_dict()
    our_w = np.asarray(state.student.params["classifier"]["aspp0"][
        "kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(
        our_w, fin["layer5.conv2d_list.0.weight"].numpy(), atol=1.2e-3)
    tea_fin = tea_t.state_dict()
    our_tw = np.asarray(state.teacher.params["classifier"]["aspp0"][
        "kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(
        our_tw, tea_fin["layer5.conv2d_list.0.weight"].numpy(), atol=1.2e-3)


def test_reference_ict_conf_per_pixel_broadcast_quirk():
    """Documents (by execution) a reference behaviour consciously NOT
    reproduced: the ICT trainer computes its teacher confidences with
    keepdim=True, so conf_tea is already (B,1,H,W), and then adds ANOTHER
    channel axis (train_seg_semisup_ict.py:344: `[:, None, :, :]`), giving
    (B,1,1,H,W). With --conf_per_pixel the subsequent
    `loss_mask * conf_mask` broadcasts (B,1,H,W) against (B,1,1,H,W) into
    (B,B,1,H,W) — gating sample i's loss by sample j's confidences (and
    inflating memory B-fold). The flag defaults to False (where only the
    scalar .mean() is used and the extra axis is harmless), so the sweep
    configs are unaffected; this framework's conf_per_pixel path gates each
    sample by its own confidences."""
    import torch

    B, H, W = 3, 8, 9
    conf_u = torch.rand(B, 1, H, W)      # keepdim=True max, as in ict.py:336
    conf_tea = conf_u                     # (mixing preserves the shape)
    conf_mask = (conf_tea >= 0.5).float()[:, None, :, :]  # ict.py:344 literal
    assert conf_mask.shape == (B, 1, 1, H, W)
    loss_mask = torch.ones(B, 1, H, W)
    out = loss_mask * conf_mask           # ict.py:352 literal (per-pixel path)
    assert out.shape == (B, B, 1, H, W)   # cross-sample gating, B-fold blowup


# ------------------------------------------------ VAT trainer differential

@pytest.mark.slow
def test_vat_step_trajectory_matches_reference_trainer(ref):
    """Third trainer-trajectory differential: the reference's VAT inner loop
    — its OWN model class, the literal power-iteration direction math
    (eval-mode direction net, per-sample-normalised noise, grad of the
    SUMMED loss w.r.t. eps, adaptive image-Jacobian radius;
    train_seg_semisup_vat_mt.py:216-301,397-464) — against this framework's
    fused VAT step, from identical imported weights, batches and IDENTICAL
    initial noise draws, for 6 optimizer steps.

    Parity caveat exercised here (freeze_bn=True, the sweep config): the
    reference's vat_direction() leaves the direction net in eval() mode, so
    when the direction net IS the teacher (the default), the teacher's
    consistency forward also runs with eval-mode BN. With frozen BN (all
    reference recipes for this trainer family) eval-mode and
    train+freeze_batchnorm are the same computation, which is what this
    framework implements; training-BN VAT would diverge there and is not
    part of the reference's executed configurations."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    import jax
    import jax.numpy as jnp
    from architectures import deeplab2 as r_dl

    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        ModelState,
        OptimizerConfig,
        TrainState,
        create_train_state,
    )
    from cutmix_seg_tpu.models import torch_import
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.semisup.vat import (
        VATConfig,
        make_vat_step,
        _normalize_per_sample,
    )

    C, layers, HW, B = 4, (1, 1, 1, 1), 48, 3
    LR, ALPHA, CW, CONF, R = 2e-3, 0.99, 0.1, 0.25, 1.0
    N_STEPS = 6

    torch.manual_seed(2)
    stu_t = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C, None, None)
    tea_t = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C, None, None)
    # NOTE: teacher params stay requires_grad=True — the reference relies on
    # autograd.grad(..., inputs=eps, only_inputs=True) to scope the power
    # step; EMAWeightOptimizer updates teacher weights out-of-graph
    student_optim = None
    seen = set()
    pre_dedup = [p for p in stu_t.pretrained_parameters()
                 if id(p) not in seen and not seen.add(id(p))]
    student_optim = torch.optim.Adam([
        dict(params=pre_dedup, lr=LR * 0.1),
        dict(params=stu_t.new_parameters(), lr=LR)])
    teacher_optim = ref.ema.EMAWeightOptimizer(tea_t, stu_t, ALPHA)
    stu_t.train()
    tea_t.train()
    stu_t.freeze_batchnorm()
    tea_t.freeze_batchnorm()
    clf_crossent_loss = nn.CrossEntropyLoss(ignore_index=255)

    def normalize_eps_t(x):
        # .reshape instead of the reference's .view: autograd.grad through
        # this test's transposed inputs yields non-contiguous grads (the
        # reference's loader-produced tensors are contiguous); same math
        x_flat = x.reshape(len(x), -1)
        mag = torch.sqrt((x_flat * x_flat).sum(dim=1))
        return x / (mag[:, None, None, None] + 1e-12)

    model = SegModel(
        name="deeplab2_tiny", module=DeepLab2(num_classes=C, layers=layers),
        mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
        param_label=_param_label, load_pretrained=None)
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=LR,
        lr_schedule=make_lr_schedule("none", LR, 1000))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(13), input_hw=(HW, HW),
        mean_teacher=True, pretrained=False)

    sd = {k: v.numpy().copy() for k, v in stu_t.state_dict().items()}
    params_u, stats_u = torch_import.map_torch_resnet(sd)
    head_u = torch_import.map_hung_deeplab_classifier(sd)
    variables = {"params": state.student.params,
                 "batch_stats": state.student.batch_stats}
    variables, _, sk1 = torch_import.merge_updates(
        variables, {"backbone": params_u}, {"backbone": stats_u})
    variables, _, sk2 = torch_import.merge_updates(
        variables, {"classifier": head_u}, {})
    assert sk1 == 0 and sk2 == 0
    params = variables["params"]
    stats = variables["batch_stats"]
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = TrainState(
        step=state.step,
        student=ModelState(params=params, batch_stats=stats),
        teacher=ModelState(params=copy(params), batch_stats=copy(stats)),
        opt_state=tx.init(params),
        rng=state.rng,
    )

    cfg = VATConfig(
        vat_radius=R, adaptive_vat_radius=True, cons_loss_fn="var",
        cons_weight=CW, conf_thresh=CONF, conf_per_pixel=False,
        freeze_bn=True, mean_teacher=True, teacher_alpha=ALPHA)
    step = jax.jit(make_vat_step(model, tx, cfg))

    rng = np.random.RandomState(5)
    noise_scale = 1.0e-6 * HW * HW / 1000.0

    def rand_batch():
        b = {
            "sup_x": rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32),
            "sup_y": rng.randint(0, C, (B, HW, HW)).astype(np.int32),
        }
        b["sup_y"][b["sup_y"] == 0] = np.where(
            rng.uniform(size=(b["sup_y"] == 0).sum()) < 0.3, 255, 0)
        # distinct tea/stu images exercise the x vs x_hat distinction in
        # the direction math (paired-augmentation contract)
        base = rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32)
        b["ux_tea"] = base
        b["ux_stu"] = (base + 0.05 * rng.normal(
            0, 1, base.shape)).astype(np.float32)
        um = np.ones((B, HW, HW, 1), np.float32)
        y0, x0 = rng.randint(0, HW, 2)
        um[:, y0:, x0:] = 0.0
        b["um"] = um
        return b

    t = lambda a: torch.tensor(np.transpose(a, (0, 3, 1, 2)))

    ref_sup, ref_cons, ref_conf = [], [], []
    our_sup, our_cons, our_conf = [], [], []
    for it in range(N_STEPS):
        batch = rand_batch()
        # our step draws its initial noise from split(state.rng, 5)[1];
        # reproduce the IDENTICAL normalised+scaled eps0 for the torch loop
        k_eps = jax.random.split(state.rng, 5)[1]
        eps0 = np.asarray(_normalize_per_sample(jax.random.normal(
            k_eps, (B, HW, HW, 3), jnp.float32)) * noise_scale,
            dtype=np.float32)

        # ---- the reference's literal VAT iteration ----
        student_optim.zero_grad()
        logits_sup = stu_t(t(batch["sup_x"]))
        sup_loss = clf_crossent_loss(
            logits_sup, torch.tensor(batch["sup_y"].astype(np.int64)))
        sup_loss.backward()

        x = t(batch["ux_tea"])
        x_hat = t(batch["ux_stu"])
        # vat_direction (vat_mt.py:226-271), direction net = teacher
        tea_t.eval()
        with torch.no_grad():
            y_pred_logits = tea_t(x).detach()
        y_pred_prob = F.softmax(y_pred_logits, dim=1)
        eps = t(eps0).clone().detach().requires_grad_(True)
        eps_pred_logits = tea_t(x_hat.detach() + eps)
        eps_pred_prob = F.softmax(eps_pred_logits, dim=1)
        delta = eps_pred_prob - y_pred_prob
        dir_loss = (delta * delta).sum()
        eps_adv = torch.autograd.grad(
            outputs=dir_loss, inputs=eps, create_graph=True,
            retain_graph=True, only_inputs=True)[0]
        eps_adv_nrm = normalize_eps_t(eps_adv)
        # adaptive radius from the image Jacobian (vat_mt.py:277-296)
        delta_v = x_hat[:, :, 2:, :] - x_hat[:, :, :-2, :]
        delta_h = x_hat[:, :, :, 2:] - x_hat[:, :, :, :-2]
        delta_v = delta_v.reshape(len(delta_v), -1)
        delta_h = delta_h.reshape(len(delta_h), -1)
        adv_radius = R * torch.sqrt(
            (delta_v ** 2).sum(dim=1) + (delta_h ** 2).sum(dim=1)
        )[:, None, None, None] * 0.5
        x_perturb = (eps_adv_nrm * adv_radius).detach()

        batch_ux_adv = x_hat + x_perturb
        with torch.no_grad():
            logits_cons_tea = tea_t(x).detach()
        logits_cons_stu = stu_t(batch_ux_adv)
        prob_cons_tea = F.softmax(logits_cons_tea, dim=1)
        prob_cons_stu = F.softmax(logits_cons_stu, dim=1)
        conf_tea = prob_cons_tea.max(dim=1)[0]
        conf_mask = (conf_tea >= CONF).float()[:, None, :, :]
        ref_conf.append(float(conf_mask.mean()))
        loss_mask = torch.tensor(np.transpose(
            batch["um"], (0, 3, 1, 2))) * conf_mask.mean()
        dp = prob_cons_stu - prob_cons_tea
        cons = (dp * dp).sum(dim=1, keepdim=True)
        cons = (cons * loss_mask).mean()
        (cons * CW).backward()
        student_optim.step()
        teacher_optim.step()
        ref_sup.append(float(sup_loss.detach()))
        ref_cons.append(float(cons.detach()))

        # ---- our fused VAT step on the same batch ----
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()},
                              jnp.float32(1.0))
        our_sup.append(float(metrics["sup_loss"]))
        our_cons.append(float(metrics["cons_loss"]))
        our_conf.append(float(metrics["conf_rate"]))

    np.testing.assert_allclose(our_sup, ref_sup, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_cons, ref_cons, rtol=2e-2, atol=2e-6)
    np.testing.assert_allclose(our_conf, ref_conf, rtol=0, atol=2e-3)

    fin = stu_t.state_dict()
    our_w = np.asarray(state.student.params["classifier"]["aspp0"][
        "kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(
        our_w, fin["layer5.conv2d_list.0.weight"].numpy(), atol=1.2e-3)
    tea_fin = tea_t.state_dict()
    our_tw = np.asarray(state.teacher.params["classifier"]["aspp0"][
        "kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(
        our_tw, tea_fin["layer5.conv2d_list.0.weight"].numpy(), atol=1.2e-3)


# --------------------------------------------- aug_mt trainer differential

@pytest.mark.slow
def test_aug_mt_step_trajectory_matches_reference_trainer(ref):
    """Fourth trainer-trajectory differential, completing the set: the
    reference's augmentation-driven consistency inner loop — teacher on
    pair element 0, student on element 1, the teacher's logits/probs/valid
    mask warped into the student frame with F.affine_grid + F.grid_sample
    (align_corners=True), the warped-confidence gate, the 'var' loss
    (train_seg_semisup_aug_mt.py:267-402) — against this framework's fused
    aug_cons step from identical imported weights, batches and pair
    matrices, for 8 optimizer steps. aug_mt's loop has NO in-step
    randomness (geometry is host-sampled), so the streams are identical by
    providing the same xf0->1 matrices to both sides."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    import jax
    import jax.numpy as jnp
    from architectures import deeplab2 as r_dl

    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        ModelState,
        OptimizerConfig,
        TrainState,
        create_train_state,
    )
    from cutmix_seg_tpu.models import torch_import
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.semisup.aug_cons import (
        AugConsConfig,
        make_aug_cons_step,
    )

    C, layers, HW, B = 4, (1, 1, 1, 1), 48, 3
    LR, ALPHA, CW, CONF = 2e-3, 0.99, 1.0, 0.25
    N_STEPS = 8

    torch.manual_seed(3)
    stu_t = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C, None, None)
    tea_t = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C, None, None)
    for p in tea_t.parameters():
        p.requires_grad = False
    seen = set()
    pre_dedup = [p for p in stu_t.pretrained_parameters()
                 if id(p) not in seen and not seen.add(id(p))]
    student_optim = torch.optim.Adam([
        dict(params=pre_dedup, lr=LR * 0.1),
        dict(params=stu_t.new_parameters(), lr=LR)])
    teacher_optim = ref.ema.EMAWeightOptimizer(tea_t, stu_t, ALPHA)
    stu_t.train()
    tea_t.train()
    stu_t.freeze_batchnorm()
    tea_t.freeze_batchnorm()
    clf_crossent_loss = nn.CrossEntropyLoss(ignore_index=255)

    model = SegModel(
        name="deeplab2_tiny", module=DeepLab2(num_classes=C, layers=layers),
        mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
        param_label=_param_label, load_pretrained=None)
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=LR,
        lr_schedule=make_lr_schedule("none", LR, 1000))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(17), input_hw=(HW, HW),
        mean_teacher=True, pretrained=False)

    sd = {k: v.numpy().copy() for k, v in stu_t.state_dict().items()}
    params_u, stats_u = torch_import.map_torch_resnet(sd)
    head_u = torch_import.map_hung_deeplab_classifier(sd)
    variables = {"params": state.student.params,
                 "batch_stats": state.student.batch_stats}
    variables, _, sk1 = torch_import.merge_updates(
        variables, {"backbone": params_u}, {"backbone": stats_u})
    variables, _, sk2 = torch_import.merge_updates(
        variables, {"classifier": head_u}, {})
    assert sk1 == 0 and sk2 == 0
    params = variables["params"]
    stats = variables["batch_stats"]
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = TrainState(
        step=state.step,
        student=ModelState(params=params, batch_stats=stats),
        teacher=ModelState(params=copy(params), batch_stats=copy(stats)),
        opt_state=tx.init(params),
        rng=state.rng,
    )

    cfg = AugConsConfig(
        cons_loss_fn="var", cons_weight=CW, conf_thresh=CONF,
        conf_per_pixel=False, freeze_bn=True, mean_teacher=True,
        teacher_alpha=ALPHA)
    step = jax.jit(make_aug_cons_step(model, tx, cfg))

    rng = np.random.RandomState(9)

    def rand_batch():
        b = {
            "sup_x": rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32),
            "sup_y": rng.randint(0, C, (B, HW, HW)).astype(np.int32),
        }
        b["sup_y"][b["sup_y"] == 0] = np.where(
            rng.uniform(size=(b["sup_y"] == 0).sum()) < 0.3, 255, 0)
        b["ux0"] = rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32)
        b["ux1"] = rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32)
        for k in ("um0", "um1"):
            um = np.ones((B, HW, HW, 1), np.float32)
            y0, x0 = rng.randint(0, HW, 2)
            um[:, y0:, x0:] = 0.0
            b[k] = um
        # plausible pair geometry directly in the torch affine_grid
        # convention: small rotation + scale + translation per sample
        th = rng.uniform(-0.3, 0.3, B)
        sc = rng.uniform(0.8, 1.25, B)
        tx_ = rng.uniform(-0.2, 0.2, B)
        ty_ = rng.uniform(-0.2, 0.2, B)
        theta = np.zeros((B, 2, 3), np.float32)
        theta[:, 0, 0] = np.cos(th) * sc
        theta[:, 0, 1] = -np.sin(th) * sc
        theta[:, 1, 0] = np.sin(th) * sc
        theta[:, 1, 1] = np.cos(th) * sc
        theta[:, 0, 2] = tx_
        theta[:, 1, 2] = ty_
        b["xf0_to_1"] = theta
        return b

    t = lambda a: torch.tensor(np.transpose(a, (0, 3, 1, 2)))

    ref_sup, ref_cons, ref_conf = [], [], []
    our_sup, our_cons, our_conf = [], [], []
    for it in range(N_STEPS):
        batch = rand_batch()

        # ---- the reference's literal aug_mt iteration ----
        student_optim.zero_grad()
        logits_sup = stu_t(t(batch["sup_x"]))
        sup_loss = clf_crossent_loss(
            logits_sup, torch.tensor(batch["sup_y"].astype(np.int64)))
        sup_loss.backward()

        ux0, ux1 = t(batch["ux0"]), t(batch["ux1"])
        um0 = torch.tensor(np.transpose(batch["um0"], (0, 3, 1, 2)))
        um1 = torch.tensor(np.transpose(batch["um1"], (0, 3, 1, 2)))
        theta_t = torch.tensor(batch["xf0_to_1"])
        with torch.no_grad():
            logits_cons_tea = tea_t(ux0).detach()
        logits_cons_stu = stu_t(ux1)
        grid = F.affine_grid(theta_t, ux0.shape, align_corners=True)
        logits_tea_in_stu = F.grid_sample(logits_cons_tea, grid,
                                          align_corners=True)
        mask_tea_in_stu = F.grid_sample(um0, grid, align_corners=True) * um1
        prob_cons_tea = F.softmax(logits_cons_tea, dim=1)
        prob_cons_stu = F.softmax(logits_cons_stu, dim=1)
        prob_tea_in_stu = F.grid_sample(prob_cons_tea, grid,
                                        align_corners=True)
        loss_mask = mask_tea_in_stu
        conf_tea = prob_tea_in_stu.max(dim=1)[0]
        conf_mask = (conf_tea >= CONF).float()[:, None, :, :]
        ref_conf.append(float(conf_mask.mean()))
        loss_mask = loss_mask * conf_mask.mean()
        dp = prob_cons_stu - prob_tea_in_stu
        cons = (dp * dp).sum(dim=1, keepdim=True)
        cons = (cons * loss_mask).mean()
        (cons * CW).backward()
        student_optim.step()
        teacher_optim.step()
        ref_sup.append(float(sup_loss.detach()))
        ref_cons.append(float(cons.detach()))

        # ---- our fused aug_cons step on the same batch ----
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()},
                              jnp.float32(1.0))
        our_sup.append(float(metrics["sup_loss"]))
        our_cons.append(float(metrics["cons_loss"]))
        our_conf.append(float(metrics["conf_rate"]))

    np.testing.assert_allclose(our_sup, ref_sup, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_cons, ref_cons, rtol=5e-3, atol=2e-6)
    np.testing.assert_allclose(our_conf, ref_conf, rtol=0, atol=2e-3)

    fin = stu_t.state_dict()
    our_w = np.asarray(state.student.params["classifier"]["aspp0"][
        "kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(
        our_w, fin["layer5.conv2d_list.0.weight"].numpy(), atol=1.2e-3)
    tea_fin = tea_t.state_dict()
    our_tw = np.asarray(state.teacher.params["classifier"]["aspp0"][
        "kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(
        our_tw, tea_fin["layer5.conv2d_list.0.weight"].numpy(), atol=1.2e-3)


def _torch_name_to_flax_path(name):
    """torch state_dict/param name -> flax ('/'-joined) param path, the same
    layout map torch_import.map_torch_resnet / map_hung_deeplab_classifier
    use (kept declarative here so the group-assignment comparison does not
    depend on the code under test)."""
    import re as _re

    parts = name.split(".")
    leaf = {"weight": "kernel", "bias": "bias"}
    bn_leaf = {"weight": "scale", "bias": "bias",
               "running_mean": "mean", "running_var": "var"}
    if parts[0] == "conv1":
        return f"backbone/conv1/{leaf[parts[1]]}"
    if parts[0] == "bn1":
        return f"backbone/bn1/{bn_leaf[parts[1]]}"
    m = _re.match(r"layer(\d+)$", parts[0])
    if m and parts[0] != "layer5":
        block = f"{parts[0]}_{parts[1]}"
        rest = parts[2:]
        if rest[0].startswith("conv"):
            return f"backbone/{block}/{rest[0]}/{leaf[rest[1]]}"
        if rest[0].startswith("bn"):
            return f"backbone/{block}/{rest[0]}/{bn_leaf[rest[1]]}"
        if rest[0] == "downsample":
            if rest[1] == "0":
                return f"backbone/{block}/downsample_conv/{leaf[rest[2]]}"
            return f"backbone/{block}/downsample_bn/{bn_leaf[rest[2]]}"
    m = _re.match(r"layer5\.conv2d_list\.(\d+)\.(weight|bias)", name)
    if m:
        return f"classifier/aspp{m.group(1)}/{leaf[m.group(2)]}"
    raise AssertionError(f"unmapped torch name {name}")


def _flatten_paths(tree):
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(str(getattr(k, "key", k)) for k in path): leaf
            for path, leaf in flat}


@pytest.mark.parametrize("n_classes_target", [5, 3])
def test_coco_partial_load_differential(ref, tmp_path, monkeypatch,
                                        n_classes_target):
    """Pretrained-variant loading differential (round-4 VERDICT weak 6):
    a synthetic COCO-style checkpoint — the reference's OWN ResNetDeepLab
    state_dict (torchvision backbone naming + layer5 ASPP head + BN running
    stats), exactly the real resnet101COCO file's key set — is loaded
    through the reference's executable size-checked partial loader
    (architectures/deeplab2.py:310-322; the same copy rule as the COCO
    factory's inline loop at :266-281) and through this framework's real
    file path (torch_import.load_resnet_deeplab2 reading a .pth from
    CUTMIX_SEG_WEIGHTS), at a MATCHING class count (head must load) and a
    MISMATCHING one (head must be skipped, backbone still loaded). Every
    tensor the reference ends up with must equal ours bit-for-bit."""
    import torch

    import jax
    from architectures import deeplab2 as r_dl

    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import OptimizerConfig, create_train_state
    from cutmix_seg_tpu.models import torch_import
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label

    layers, C_DONOR = (1, 1, 1, 1), 5

    # ---- synthetic COCO-style donor: the reference's own model class ----
    torch.manual_seed(42)
    donor = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C_DONOR,
                               None, None)
    with torch.no_grad():
        for p in donor.parameters():
            p.normal_(0, 0.05)
        for mod in donor.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 1.5)
    sd_donor = {k: v.detach().clone() for k, v in donor.state_dict().items()}
    torch.save(sd_donor, tmp_path / "resnet101_deeplab_coco.pth")
    monkeypatch.setenv("CUTMIX_SEG_WEIGHTS", str(tmp_path))

    # ---- reference side: its executable partial loader ----
    torch.manual_seed(7)
    model_r = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers),
                                 n_classes_target, None, None)
    head_init_r = {k: v.detach().clone()
                   for k, v in model_r.state_dict().items()
                   if k.startswith("layer5.")}
    r_dl._load_state_into_model(model_r, sd_donor)
    sd_ref = {k: v.numpy().copy() for k, v in model_r.state_dict().items()}

    # ---- our side: the real loader path (reads the .pth) ----
    model = SegModel(
        name="deeplab2_tiny",
        module=DeepLab2(num_classes=n_classes_target, layers=layers),
        mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
        param_label=_param_label, load_pretrained=None)
    opt_cfg = OptimizerConfig(opt_type="adam", learning_rate=1e-3,
                              lr_schedule=make_lr_schedule("none", 1e-3, 10))
    state, _ = create_train_state(model, opt_cfg, jax.random.PRNGKey(3),
                                  input_hw=(48, 48), mean_teacher=False,
                                  pretrained=False)
    variables = {"params": state.student.params,
                 "batch_stats": state.student.batch_stats}
    head_init_ours = _flatten_paths(
        jax.tree_util.tree_map(np.asarray, variables["params"]["classifier"]))
    loaded = torch_import.load_resnet_deeplab2(variables,
                                               "resnet101_deeplab_coco")

    ours_p = _flatten_paths(loaded["params"])
    ours_s = _flatten_paths(loaded["batch_stats"])

    # every tensor of the reference-loaded model must equal ours: map the
    # REFERENCE's post-load state_dict through the declarative name map and
    # compare leaf-for-leaf (conv kernels compared in flax HWIO layout)
    n_checked = 0
    for name, val in sd_ref.items():
        if name.endswith("num_batches_tracked"):
            continue
        path = _torch_name_to_flax_path(name)
        is_stat = path.endswith("/mean") or path.endswith("/var")
        ours = np.asarray(ours_s[path] if is_stat else ours_p[path])
        if path.endswith("kernel"):
            val = np.transpose(val, (2, 3, 1, 0))
        if path.startswith("classifier") and n_classes_target != C_DONOR:
            # mismatched head: the reference keeps ITS init, we keep OURS
            # (both sides skipped the copy — sizes differ)
            tname = f"layer5.conv2d_list.{path.split('aspp')[1][0]}." + (
                "weight" if path.endswith("kernel") else "bias")
            want_r = head_init_r[tname].numpy()
            if path.endswith("kernel"):
                want_r = np.transpose(want_r, (2, 3, 1, 0))
            np.testing.assert_array_equal(val, want_r)
            np.testing.assert_array_equal(
                ours, head_init_ours[path.split("classifier/")[1]])
        else:
            np.testing.assert_array_equal(val, ours)
        n_checked += 1
    # full coverage: nothing in our param tree the map did not visit
    assert n_checked == len(ours_p) + len(ours_s)


def test_param_group_assignment_matches_reference_generators(ref):
    """Two-LR param-group differential: the reference's optimizer splits
    parameters via pretrained_parameters() / new_parameters() with BN
    affines excluded entirely (requires_grad=False at construction;
    architectures/deeplab2.py:71-84,143-144,208-242,
    train_seg_semisup_mask_mt.py:90-98). Our _param_label must assign the
    SAME group to every parameter: 'pretrained' (0.1x LR) exactly where the
    reference's pretrained_parameters() yields it, 'new' (full LR) exactly
    for the classifier head, 'frozen' (no updates) exactly for the BN
    affines the reference excludes."""
    import torch

    import jax
    import jax.numpy as jnp
    from architectures import deeplab2 as r_dl

    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label

    layers, C = (1, 1, 1, 1), 5
    torch.manual_seed(0)
    model_r = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C,
                                 None, None)
    name_of = {id(p): n for n, p in model_r.named_parameters()}
    seen = set()
    pre_names = {name_of[id(p)] for p in model_r.pretrained_parameters()
                 if id(p) not in seen and not seen.add(id(p))}
    new_names = {name_of[id(p)] for p in model_r.new_parameters()}
    frozen_names = {n for n, p in model_r.named_parameters()
                    if not p.requires_grad}
    assert not (pre_names & new_names) and not (pre_names & frozen_names)

    module = DeepLab2(num_classes=C, layers=layers)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 48, 48, 3), jnp.float32),
                            train=False)
    labels = _flatten_paths(_param_label(variables["params"]))

    n_checked = 0
    for name, _ in model_r.named_parameters():
        path = _torch_name_to_flax_path(name)
        if name in pre_names:
            want = "pretrained"
        elif name in new_names:
            want = "new"
        else:
            assert name in frozen_names, name
            want = "frozen"
        assert labels[path] == want, (name, path, labels[path], want)
        n_checked += 1
    # exhaustive on both sides: every flax param leaf had a torch twin
    assert n_checked == len(labels)


def test_cutout_step_trajectory_matches_reference_trainer(ref):
    """Cutout-mode (mask_mode='zero') trainer differential — the one mask_mt
    branch the round-4 harness verified only at unit level: the reference's
    literal cut branch (train_seg_semisup_mask_mt.py:371-401 — single unsup
    batch, x_cut = x * mask, teacher on the UNCUT image, loss_mask =
    cut_mask * validity) with its own ResNetDeepLab / EMAWeightOptimizer /
    two-LR Adam, against our fused step in mask_mode='zero' with the paper's
    Cutout box config (prop 0.0:1.0, run_pascal_aug_experiments.sh:21,32),
    from identical imported weights, batches and masks, for 6 steps."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    import jax
    import jax.numpy as jnp
    from architectures import deeplab2 as r_dl

    from cutmix_seg_tpu.core.schedules import make_lr_schedule
    from cutmix_seg_tpu.core.train_state import (
        ModelState,
        OptimizerConfig,
        TrainState,
        create_train_state,
    )
    from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig, sample_masks
    from cutmix_seg_tpu.models import torch_import
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
    from cutmix_seg_tpu.models.common import SegModel
    from cutmix_seg_tpu.semisup.mask_mt import (
        MaskConsistencyConfig,
        make_mask_mt_step,
    )

    C, layers, HW, B = 4, (1, 1, 1, 1), 48, 3
    LR, ALPHA, CW, CONF = 2e-3, 0.99, 1.0, 0.25
    N_STEPS = 6
    box = BoxMaskConfig((0.0, 1.0))  # the paper's Cutout prop range

    torch.manual_seed(1)
    stu_t = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C, None, None)
    tea_t = r_dl.ResNetDeepLab(r_dl.Bottleneck, list(layers), C, None, None)
    for p in tea_t.parameters():
        p.requires_grad = False
    seen = set()
    pre_dedup = [p for p in stu_t.pretrained_parameters()
                 if id(p) not in seen and not seen.add(id(p))]
    student_optim = torch.optim.Adam([
        dict(params=pre_dedup, lr=LR * 0.1),
        dict(params=stu_t.new_parameters(), lr=LR)])
    teacher_optim = ref.ema.EMAWeightOptimizer(tea_t, stu_t, ALPHA)
    stu_t.train()
    tea_t.train()
    stu_t.freeze_batchnorm()
    tea_t.freeze_batchnorm()
    clf_crossent_loss = nn.CrossEntropyLoss(ignore_index=255)

    model = SegModel(
        name="deeplab2_tiny", module=DeepLab2(num_classes=C, layers=layers),
        mean=np.zeros(3), std=np.ones(3), block_size=(1, 1),
        param_label=_param_label, load_pretrained=None)
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=LR,
        lr_schedule=make_lr_schedule("none", LR, 1000))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(11), input_hw=(HW, HW),
        mean_teacher=True, pretrained=False)
    sd = {k: v.numpy().copy() for k, v in stu_t.state_dict().items()}
    params_u, stats_u = torch_import.map_torch_resnet(sd)
    head_u = torch_import.map_hung_deeplab_classifier(sd)
    variables = {"params": state.student.params,
                 "batch_stats": state.student.batch_stats}
    variables, _, sk1 = torch_import.merge_updates(
        variables, {"backbone": params_u}, {"backbone": stats_u})
    variables, _, sk2 = torch_import.merge_updates(
        variables, {"classifier": head_u}, {})
    assert sk1 == 0 and sk2 == 0
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = TrainState(
        step=state.step,
        student=ModelState(params=variables["params"],
                           batch_stats=variables["batch_stats"]),
        teacher=ModelState(params=copy(variables["params"]),
                           batch_stats=copy(variables["batch_stats"])),
        opt_state=tx.init(variables["params"]),
        rng=state.rng,
    )

    cfg = MaskConsistencyConfig(
        mask_mode="zero", box=box, cons_loss_fn="var", cons_weight=CW,
        conf_thresh=CONF, conf_per_pixel=False, freeze_bn=True,
        mean_teacher=True, teacher_alpha=ALPHA, pallas_cutmix="off")
    step = jax.jit(make_mask_mt_step(model, tx, cfg))

    rng = np.random.RandomState(5)

    def rand_batch():
        b = {
            "sup_x": rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32),
            "sup_y": rng.randint(0, C, (B, HW, HW)).astype(np.int32),
        }
        x = rng.normal(0, 1, (B, HW, HW, 3)).astype(np.float32)
        b["ux_tea"] = x
        b["ux_stu"] = x
        um = np.ones((B, HW, HW, 1), np.float32)
        y0, x0 = rng.randint(0, HW, 2)
        um[:, y0:, x0:] = 0.0
        b["um"] = um
        return b

    t = lambda a: torch.tensor(np.transpose(a, (0, 3, 1, 2)))

    ref_sup, ref_cons, ref_conf = [], [], []
    our_sup, our_cons, our_conf = [], [], []
    for it in range(N_STEPS):
        batch = rand_batch()
        k_mask = jax.random.split(state.rng, 5)[1]
        masks = np.asarray(sample_masks(box, k_mask, B, (HW, HW),
                                        dtype=jnp.float32))

        # ---- the reference's literal cut iteration ----
        student_optim.zero_grad()
        logits_sup = stu_t(t(batch["sup_x"]))
        sup_loss = clf_crossent_loss(
            logits_sup, torch.tensor(batch["sup_y"].astype(np.int64)))
        sup_loss.backward()

        m_t = torch.tensor(np.transpose(masks, (0, 3, 1, 2)))
        ux_cut = t(batch["ux_stu"]) * m_t
        with torch.no_grad():
            logits_tea = tea_t(t(batch["ux_tea"])).detach()
        logits_stu = stu_t(ux_cut)
        prob_tea = F.softmax(logits_tea, dim=1)
        prob_stu = F.softmax(logits_stu, dim=1)
        loss_mask = m_t * torch.tensor(
            np.transpose(batch["um"], (0, 3, 1, 2)))
        conf_tea = prob_tea.max(dim=1)[0]
        conf_mask = (conf_tea >= CONF).float()[:, None, :, :]
        ref_conf.append(float(conf_mask.mean()))
        loss_mask = loss_mask * conf_mask.mean()
        delta = prob_stu - prob_tea
        cons = (delta * delta).sum(dim=1, keepdim=True)
        cons = (cons * loss_mask).mean()
        (cons * CW).backward()
        student_optim.step()
        teacher_optim.step()
        ref_sup.append(float(sup_loss.detach()))
        ref_cons.append(float(cons.detach()))

        # ---- our fused step ----
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()},
                              jnp.float32(1.0))
        our_sup.append(float(metrics["sup_loss"]))
        our_cons.append(float(metrics["cons_loss"]))
        our_conf.append(float(metrics["conf_rate"]))

    np.testing.assert_allclose(our_sup, ref_sup, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_cons, ref_cons, rtol=5e-3, atol=2e-5)
    np.testing.assert_allclose(our_conf, ref_conf, rtol=0, atol=2e-3)

    fin = stu_t.state_dict()
    our_w = np.asarray(state.student.params["classifier"]["aspp0"][
        "kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(
        our_w, fin["layer5.conv2d_list.0.weight"].numpy(), atol=5e-4)
    tea_fin = tea_t.state_dict()
    our_tw = np.asarray(state.teacher.params["classifier"]["aspp0"][
        "kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(
        our_tw, tea_fin["layer5.conv2d_list.0.weight"].numpy(), atol=5e-4)


@pytest.mark.parametrize("variant", ["mean_teacher", "pi"])
def test_toy2d_step_trajectory_matches_reference_trainer(ref, variant):
    """Toy2D trainer-trajectory differential — the one trainer family that
    was unit-only through round 4 (toy2d_train.py:325-443): the reference's
    literal inner loop (Gaussian-perturbation consistency, per-sample
    confidence factor, distance-map contour gating via F.grid_sample, the
    sum/weight.sum normaliser, ONE combined backward, single-LR Adam, its
    own EMAWeightOptimizer) against our shipped Toy2DAlgo.train_step, from
    identical imported MLP weights, identical perturbation noise and an
    identical synthetic distance map, for 8 steps, in both the mean_teacher
    and pi variants (:355-366).

    Dropout is the one part disabled on BOTH sides (reference nets held in
    eval() so nn.Dropout is identity; our net built without the dropout
    layer): its draws cannot be aligned across frameworks. Everything else
    is the literal loop."""
    import torch
    import torch.nn.functional as F
    from torch import nn as tnn

    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as fnn

    from cutmix_seg_tpu.core.train_state import ModelState
    from cutmix_seg_tpu.toy2d.train import Toy2DAlgo

    N_HID, HID, B, N_STEPS = 2, 32, 8, 8
    LR, ALPHA, CW, CONF, DCR = 2e-3, 0.95, 1.0, 0.3, 0.4
    PSTD = np.array([0.15, 0.15], np.float32)

    # ---- reference side: the Network the trainer builds inline
    # (toy2d_train.py:83-122, norm_layer='none', hidden_act='relu'),
    # dropout inactive via eval() mode ----
    torch.manual_seed(3)

    class RefNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.drop = tnn.Dropout()
            hidden = []
            chn_in = 2
            for _ in range(N_HID):
                hidden.append(tnn.Linear(chn_in, HID))
                hidden.append(tnn.ReLU())
                chn_in = HID
            self.hidden = tnn.Sequential(*hidden)
            self.l_final = tnn.Linear(chn_in, 2)

        def forward(self, x, use_dropout=True):
            x = self.hidden(x)
            if use_dropout:
                x = self.drop(x)
            return self.l_final(x)

    stu_t = RefNet()
    mean_teacher = variant == "mean_teacher"
    if mean_teacher:
        tea_t = RefNet()
        for p in tea_t.parameters():
            p.requires_grad = False
        teacher_optim = ref.ema.EMAWeightOptimizer(tea_t, stu_t, ALPHA)
    else:
        tea_t, teacher_optim = stu_t, None
    stu_t.eval()
    tea_t.eval()
    student_optim = torch.optim.Adam(stu_t.parameters(), lr=LR)
    classification_criterion = tnn.CrossEntropyLoss()

    def robust_binary_crossentropy(pred, tgt):  # :146-149, verbatim
        inv_tgt = -tgt + 1.0
        inv_pred = -pred + 1.0 + 1e-6
        return -(tgt * torch.log(pred + 1.0e-6) + inv_tgt * torch.log(inv_pred))

    rng = np.random.RandomState(0)
    dist_map_np = rng.normal(0, 1, (16, 16)).astype(np.float32)
    for _ in range(3):  # smooth it a bit: contours exist
        dist_map_np = (dist_map_np
                       + np.roll(dist_map_np, 1, 0) + np.roll(dist_map_np, -1, 0)
                       + np.roll(dist_map_np, 1, 1) + np.roll(dist_map_np, -1, 1)) / 5.0
    t_dist_map = torch.tensor(dist_map_np[None, None])

    def dist_map_weighting(batch_u_X, batch_u_X_1):  # :172-206, verbatim
        sample_points_0 = torch.cat([batch_u_X[:, 1].view(1, 1, -1, 1),
                                     batch_u_X[:, 0].view(1, 1, -1, 1)], dim=3)
        sample_points_1 = torch.cat([batch_u_X_1[:, 1].view(1, 1, -1, 1),
                                     batch_u_X_1[:, 0].view(1, 1, -1, 1)], dim=3)
        sample_points = torch.cat([sample_points_0, sample_points_1], dim=1)
        dist_from_boundary = F.grid_sample(t_dist_map, sample_points,
                                           align_corners=False)
        delta_dist_sqr = (dist_from_boundary[0, 0, 0, :]
                          - dist_from_boundary[0, 0, 1, :]).pow(2)
        return (delta_dist_sqr <= (DCR * DCR)).float()

    def conf_factor_t(teacher_pred_prob):  # :157-168, conf_avg=False
        conf_tea = torch.max(teacher_pred_prob, 1)[0].detach()
        return (conf_tea >= CONF).float()

    # ---- our side: the shipped step with a dropout-free MLP ----
    class NoDropMLP(fnn.Module):
        @fnn.compact
        def __call__(self, x, train: bool, use_dropout: bool = True):
            for i in range(N_HID):
                x = fnn.relu(fnn.Dense(HID, name=f"dense{i}")(x))
            return fnn.Dense(2, name="final")(x)

    net = NoDropMLP()
    tx = optax.adam(LR)
    algo = Toy2DAlgo(net, tx, model=variant, cons_weight=CW,
                     cons_loss_fn="var", cons_no_dropout=True,
                     conf_thresh=CONF, conf_avg=False, teacher_alpha=ALPHA,
                     pstd_real=PSTD, dist_contour_range=DCR,
                     dist_map=jnp.asarray(dist_map_np))

    sd = {k: v.detach().numpy().copy() for k, v in stu_t.state_dict().items()}
    params = {}
    for i in range(N_HID):
        params[f"dense{i}"] = {
            "kernel": jnp.asarray(sd[f"hidden.{2 * i}.weight"].T),
            "bias": jnp.asarray(sd[f"hidden.{2 * i}.bias"])}
    params["final"] = {"kernel": jnp.asarray(sd["l_final.weight"].T),
                       "bias": jnp.asarray(sd["l_final.bias"])}
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    student = ModelState(params=params, batch_stats={})
    teacher = (ModelState(params=copy(params), batch_stats={})
               if mean_teacher else None)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(9)

    ref_sup, ref_cons, ref_conf = [], [], []
    our_sup, our_cons, our_conf = [], [], []
    for it in range(N_STEPS):
        sup_x = rng.uniform(-1, 1, (B, 2)).astype(np.float32)
        sup_y = rng.randint(0, 2, (B,))
        unsup_x = rng.uniform(-1, 1, (B, 2)).astype(np.float32)
        # reproduce the noise OUR step will draw so the reference loop
        # consumes the IDENTICAL perturbation (same substitution the seg
        # trajectory differentials make for the CutMix masks)
        k_noise = jax.random.split(key, 5)[1]
        noise = np.asarray(jax.random.normal(k_noise, unsup_x.shape)
                           ) * PSTD[None, :]

        # ---- the reference's literal iteration (:334-414) ----
        batch_X = torch.tensor(sup_x)
        batch_y = torch.tensor(sup_y, dtype=torch.long)
        batch_u_X = torch.tensor(unsup_x)
        batch_u_X_1 = batch_u_X + torch.tensor(noise)
        student_optim.zero_grad()
        student_sup_logits = stu_t(batch_X)
        sup_loss = classification_criterion(student_sup_logits, batch_y)
        if mean_teacher:
            teacher_unsup_logits = tea_t(batch_u_X, use_dropout=False).detach()
            student_unsup_logits = stu_t(batch_u_X_1, use_dropout=False)
        else:  # pi: both through the student, gradient flows through both
            teacher_unsup_logits = stu_t(batch_u_X, use_dropout=False)
            student_unsup_logits = stu_t(batch_u_X_1, use_dropout=False)
        teacher_unsup_prob = F.softmax(teacher_unsup_logits, dim=1)
        student_unsup_prob = F.softmax(student_unsup_logits, dim=1)
        weight = dist_map_weighting(batch_u_X, batch_u_X_1)
        conf_fac = conf_factor_t(teacher_unsup_prob)
        mod_fac = conf_fac * weight
        d_aug_loss = student_unsup_prob - teacher_unsup_prob
        aug_loss = (d_aug_loss * d_aug_loss).mean(dim=1) * mod_fac
        cons_loss = aug_loss.sum() / weight.sum()
        loss = sup_loss + cons_loss * CW
        loss.backward()
        student_optim.step()
        if teacher_optim is not None:
            teacher_optim.step()
        ref_sup.append(float(sup_loss.detach()))
        ref_cons.append(float(cons_loss.detach()))
        ref_conf.append(float(conf_fac.sum()))

        # ---- our shipped step ----
        student, teacher, opt_state, key, metrics = algo.train_step(
            student, teacher, opt_state, key, jnp.asarray(sup_x),
            jnp.asarray(sup_y, jnp.int32), jnp.asarray(unsup_x))
        our_sup.append(float(metrics["sup_loss"]))
        our_cons.append(float(metrics["cons_loss"]))
        our_conf.append(float(metrics["conf_sum"]))

    np.testing.assert_allclose(our_sup, ref_sup, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(our_cons, ref_cons, rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose(our_conf, ref_conf, rtol=0, atol=1e-6)

    fin = stu_t.state_dict()
    np.testing.assert_allclose(
        np.asarray(student.params["final"]["kernel"]).T,
        fin["l_final.weight"].numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(student.params["dense0"]["kernel"]).T,
        fin["hidden.0.weight"].numpy(), atol=1e-5)
    if mean_teacher:
        tea_fin = tea_t.state_dict()
        np.testing.assert_allclose(
            np.asarray(teacher.params["final"]["kernel"]).T,
            tea_fin["l_final.weight"].numpy(), atol=1e-5)


@pytest.mark.slow
def test_long_horizon_drift_is_numerical_and_eval_paths_agree(ref):
    """Round-5 VERDICT item 4a/4b, in-suite: 50 optimizer steps of the
    mask_mt differential (scripts/trajectory_drift_probe.py::run — the
    reference's literal loop vs our fused step from identical weights),
    asserting the divergence is f32-accumulation-sized rather than a
    semantic leak, the confidence gate stays bit-stable, and the two eval
    procedures (the reference's per-sample argmax/EvaluatorIoU loop on its
    final teacher vs our confusion-matrix path on ours) land on the same
    val mIoU — with the cross-loaded control (identical reference teacher
    weights through both eval paths) agreeing pixel-for-pixel."""
    scripts_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        from trajectory_drift_probe import run
    finally:
        sys.path.remove(scripts_dir)

    doc = run(n_steps=50, record_every=10)
    s = doc["summary"]
    assert s["max_rel_sup_second_half"] < 0.02, s
    assert s["max_rel_cons_second_half"] < 0.05, s
    assert s["conf_rate_max_abs_diff"] <= 5e-3, s
    # drift must be numerical-sized in whichever regime the horizon is in:
    # early, per-step rounding injection dominates (drift a small fraction
    # of the distance the weights travelled); late, Lyapunov amplification
    # dominates (drift comparable to the reference's own divergence from a
    # 1e-7-perturbed copy of itself under the same batches — measured
    # ratio 1.02 at 100 steps in the committed artifact)
    fd = s["final_drift"]
    assert (s["drift_vs_chaos_classifier"] < 3.0
            or fd["stu_classifier_drift_over_movement"] < 0.15), s
    e = doc["eval_parity"]
    assert e["abs_miou_diff"] <= 0.02, e
    assert e["crossload_pixel_agreement"] >= 0.995, e


@pytest.fixture
def whole_program_env(tmp_path, ref, monkeypatch):
    """Small-image VOC-format tree + config + CPU/no-egress shims for
    running the reference's COMPOSED trainer entry end-to-end."""
    import torch
    from PIL import Image

    # small images keep the full-resolution eval forwards minutes-scale on
    # the CPU-only host; same on-disk contract as real VOC2012
    root = tmp_path / "VOC2012"
    rng = np.random.RandomState(7)
    os.makedirs(root / "JPEGImages")
    os.makedirs(root / "SegmentationClass")
    os.makedirs(root / "ImageSets" / "Segmentation")
    names = [f"2007_{i:06d}" for i in range(14)]
    for name in names:
        h, w = int(rng.randint(80, 112)), int(rng.randint(96, 128))
        ys, xs = np.mgrid[0:h, 0:w]
        img = np.clip(rng.normal(110, 20, (h, w, 3)), 0, 255)
        lab = np.zeros((h, w), np.uint8)
        for cls in (5, 9, 12, 15):
            cy, cx = rng.randint(0, h), rng.randint(0, w)
            r = rng.randint(h // 6 + 1, h // 2)
            m = (ys - cy) ** 2 + (xs - cx) ** 2 <= r * r
            img[m] = np.clip(rng.normal(40 + cls * 10, 15, (int(m.sum()), 3)),
                             0, 255)
            lab[m] = cls
        lab[:2, :] = 255
        Image.fromarray(img.astype(np.uint8)).save(
            root / "JPEGImages" / f"{name}.jpg", quality=92)
        Image.fromarray(lab).save(root / "SegmentationClass" / f"{name}.png")
    (root / "ImageSets" / "Segmentation" / "train.txt").write_text(
        "\n".join(names[:10]) + "\n")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(names[10:]) + "\n")

    cfg = tmp_path / "semantic_segmentation.cfg"
    cfg.write_text(f"[paths]\npascal_voc = {root}\n")
    import settings as ref_settings

    monkeypatch.setattr(ref_settings, "_CONFIG_PATH", str(cfg))
    monkeypatch.setattr(ref_settings, "_config__", None)
    monkeypatch.setattr(ref_settings, "dnnlib", None)
    monkeypatch.setenv("CUTMIX_SEG_CONFIG", str(cfg))
    from cutmix_seg_tpu.data import settings as our_settings

    monkeypatch.setattr(our_settings, "_config", None)

    # no-egress: the composed run must execute the literal pretrained-load
    # code path; an empty checkpoint makes the partial copy a no-op
    # (random init; weight fidelity is covered by its own differential)
    from architectures import deeplab2 as r_dl

    monkeypatch.setattr(r_dl, "load_state_dict_from_url", lambda url: {})

    # the trainer imports torchvision.transforms unconditionally (used only
    # under aug_strong_colour); give the stub the submodule
    if not hasattr(sys.modules.get("torchvision"), "transforms"):
        tvt = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"].transforms = tvt
        sys.modules["torchvision.transforms"] = tvt

    # CPU-only host: the reference hardcodes cuda:0
    # (train_seg_semisup_mask_mt.py:58) and moves everything with .to();
    # intercept Tensor.to / Module.to rather than torch.device itself
    # (replacing torch.device breaks `torch.device | None` unions in
    # torch's lazily-imported internals)
    def _cpu(a):
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        if isinstance(a, str) and a.startswith("cuda"):
            return "cpu"
        return a

    real_t_to = torch.Tensor.to
    real_m_to = torch.nn.Module.to

    def t_to(self, *args, **kw):
        kw = {k: _cpu(v) for k, v in kw.items()}
        return real_t_to(self, *map(_cpu, args), **kw)

    def m_to(self, *args, **kw):
        kw = {k: _cpu(v) for k, v in kw.items()}
        return real_m_to(self, *map(_cpu, args), **kw)

    monkeypatch.setattr(torch.Tensor, "to", t_to)
    monkeypatch.setattr(torch.nn.Module, "to", m_to)
    yield tmp_path
    monkeypatch.setattr(our_settings, "_config", None)


_EPOCH_RE = re.compile(
    r"Epoch (\d+): took ([\d.]+)s, TRAIN clf loss=([-\d.e]+), "
    r"consistency loss=([-\d.e]+), conf rate=([\d.]+)%, "
    r"VAL mIoU=([\d.]+)%")


def _parse_composed_log(path):
    text = open(path).read()
    out = {"epochs": [], "per_class": []}
    for m in re.finditer(r"len\((\w+_ndx)\)=(\d+)", text):
        out["len_" + m.group(1)] = int(m.group(2))
    m = re.search(r"sup_ndx=(\[[^\]]*\])", text)
    out["sup_ndx"] = json.loads(m.group(1)) if m else None
    for m in _EPOCH_RE.finditer(text):
        out["epochs"].append({
            "epoch": int(m.group(1)),
            "clf_loss": float(m.group(3)),
            "cons_loss": float(m.group(4)),
            "conf_rate": float(m.group(5)) / 100.0,
            "val_miou": float(m.group(6)) / 100.0,
        })
    for m in re.finditer(r"^-- (.+)$", text, re.M):
        out["per_class"].append([float(x.rstrip("%"))
                                 for x in m.group(1).split(", ")])
    return out


@pytest.mark.slow
def test_whole_program_differential(whole_program_env, ref, monkeypatch):
    """THE composed-program differential (round-5 VERDICT item 1): the
    reference's literal trainer entry executed end-to-end —
    job_helper.job(...).submit -> datasets.load_dataset -> its DataLoaders
    (RepeatSampler over SubsetRandomSampler, cv2 transforms in the workers,
    SegCollate + AddMaskParamsToBatch) -> its train/eval loop
    (train_seg_semisup_mask_mt.py:199-217,257-530) — on a tiny on-disk
    VOC-format dataset, against our CLI trainer on the same files and
    flags. Asserts identical split indices, identical per-epoch printed
    field format, and loss/mIoU trajectories within a stated tolerance
    (the two programs draw augmentation/masks from different RNG engines,
    so trajectories agree statistically, not bitwise — the bit-level step
    parity lives in the trajectory differentials above)."""
    import torch

    tmp = whole_program_env
    flags = dict(
        dataset="pascal", model="mean_teacher",
        arch="resnet101_deeplab_imagenet", freeze_bn=True,
        opt_type="adam", sgd_momentum=0.9, sgd_nesterov=False,
        sgd_weight_decay=5e-4, learning_rate=1e-4, lr_sched="none",
        lr_step_epochs="", lr_step_gamma=0.1, lr_poly_power=0.9,
        teacher_alpha=0.99, bin_fill_holes=False, crop_size="64,64",
        aug_hflip=True, aug_vflip=False, aug_hvflip=False,
        aug_scale_hung=False, aug_max_scale=1.0,
        aug_scale_non_uniform=False, aug_rot_mag=0.0,
        aug_strong_colour=False, aug_colour_brightness=0.4,
        aug_colour_contrast=0.4, aug_colour_saturation=0.4,
        aug_colour_hue=0.1, aug_colour_prob=0.8,
        aug_colour_greyscale_prob=0.2,
        mask_mode="mix", mask_prop_range="0.5", boxmask_n_boxes=1,
        boxmask_fixed_aspect_ratio=False, boxmask_by_size=False,
        boxmask_outside_bounds=False, boxmask_no_invert=False,
        cons_loss_fn="var", cons_weight=1.0, conf_thresh=0.05,
        conf_per_pixel=False, rampup=-1, unsup_batch_ratio=1,
        num_epochs=2, iters_per_epoch=8, batch_size=4,
        n_sup=4, n_unsup=-1, n_val=-1, split_seed=12345, split_path=None,
        val_seed=131, save_preds=False, save_model=False, num_workers=2,
    )

    # ---- the reference's composed program, via its own job entry ----
    import train_seg_semisup_mask_mt as ref_trainer

    torch.manual_seed(0)
    np.random.seed(0)
    ref_cwd = tmp / "ref_run"
    os.makedirs(ref_cwd)
    monkeypatch.chdir(ref_cwd)
    ref_trainer.train_seg_semisup_mask_mt.submit(job_desc="whole_prog",
                                                 **flags)
    ref_log = ref_cwd / "results" / "train_seg_semisup_mask_mt" / \
        "log_whole_prog.txt"
    assert ref_log.exists()  # job_helper run-dir/log-tee contract
    # duplicate-job dedup: a second submit must skip, not re-run
    ref_trainer.train_seg_semisup_mask_mt.submit(job_desc="whole_prog",
                                                 **flags)

    # ---- our CLI trainer on the same files/flags ----
    from cutmix_seg_tpu.core import job as our_job
    from cutmix_seg_tpu.train.mask_mt import (
        train_seg_semisup_mask_mt as our_fn,
    )

    ours = dict(flags)
    ours.update(compute_dtype="float32", n_devices=1, resume=False,
                nan_check_interval=100, seed=0, no_pretrained=True,
                data_on_device="off", checkpoint_interval=1000)
    our_job.submit("train_seg_semisup_mask_mt", "whole_prog", our_fn, ours,
                   results_root=str(tmp / "ours" / "results"))
    our_log = tmp / "ours" / "results" / "train_seg_semisup_mask_mt" / \
        "whole_prog" / "log_whole_prog.txt"
    assert our_log.exists()  # same run-dir/log contract

    r = _parse_composed_log(str(ref_log))
    o = _parse_composed_log(str(our_log))

    # identical split indices through the composed entry
    assert r["sup_ndx"] is not None and o["sup_ndx"] == r["sup_ndx"]
    for k in ("len_sup_ndx", "len_unsup_ndx", "len_val_ndx"):
        assert o.get(k) == r.get(k) and r.get(k, 0) > 0, k

    # identical per-epoch printed field format, same epoch count, same
    # per-class IoU arity (21 classes)
    assert len(r["epochs"]) == flags["num_epochs"]
    assert len(o["epochs"]) == flags["num_epochs"]
    assert all(len(pc) == 21 for pc in r["per_class"] + o["per_class"])

    # trajectories within stated tolerance: different augmentation RNG
    # engines, same program. At this horizon the sup loss sits near
    # ln(21)~3.0 and decays identically; the consistency loss and conf
    # rate are scale-matched.
    for re_, oe in zip(r["epochs"], o["epochs"]):
        assert abs(re_["clf_loss"] - oe["clf_loss"]) < 0.5, (re_, oe)
        assert abs(re_["cons_loss"] - oe["cons_loss"]) < 0.05, (re_, oe)
        assert abs(re_["conf_rate"] - oe["conf_rate"]) < 0.25, (re_, oe)
        assert abs(re_["val_miou"] - oe["val_miou"]) < 0.15, (re_, oe)
