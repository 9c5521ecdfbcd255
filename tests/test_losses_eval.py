"""Loss-menu, confidence, EMA, rampup and IoU parity tests.

IoU parity is checked bit-exactly against an independent NumPy implementation
of the reference evaluator semantics (per-class masked I/U with ignore=255;
reference: evaluation.py:18-62) and against torch CE for the supervised loss.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cutmix_seg_tpu.ops.iou import EvaluatorIoU, confusion_matrix, i_and_u_from_cm
from cutmix_seg_tpu.semisup.ema import ema_init, ema_update
from cutmix_seg_tpu.semisup.losses import (
    confidence_mask,
    consistency_loss_per_pixel,
    cross_entropy_ignore,
)
from cutmix_seg_tpu.utils.rampup import sigmoid_rampup
from cutmix_seg_tpu.core.schedules import make_lr_schedule


def _np_i_u(pred, tru, num_classes, ignore_value=255):
    mask = tru != ignore_value
    inter, union = [], []
    for c in range(num_classes):
        p = (pred == c) & mask
        t = (tru == c) & mask
        inter.append((p & t).sum())
        union.append((p | t).sum())
    return np.array(inter), np.array(union)


def test_confusion_iou_parity():
    rng = np.random.RandomState(0)
    C = 7
    tru = rng.randint(0, C, size=(3, 33, 41))
    tru[rng.uniform(size=tru.shape) < 0.1] = 255
    pred = rng.randint(0, C, size=(3, 33, 41))
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(tru), C, 255)
    i, u = i_and_u_from_cm(cm)
    ref_i, ref_u = _np_i_u(pred, tru, C)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_array_equal(np.asarray(u), ref_u)


def test_evaluator_streaming_score():
    rng = np.random.RandomState(1)
    C = 4
    ev = EvaluatorIoU(C)
    all_p, all_t = [], []
    for _ in range(3):
        t = rng.randint(0, C, size=(2, 16, 16))
        t[rng.uniform(size=t.shape) < 0.05] = 255
        p = rng.randint(0, C, size=(2, 16, 16))
        ev.update_batch(p, t)
        all_p.append(p)
        all_t.append(t)
    ref_i, ref_u = _np_i_u(np.concatenate(all_p), np.concatenate(all_t), C)
    np.testing.assert_allclose(ev.score(), ref_i / np.maximum(ref_u, 1.0))


def test_cross_entropy_matches_torch_ignore():
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 9, 9, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=(2, 9, 9))
    labels[rng.uniform(size=labels.shape) < 0.2] = 255
    ours = float(cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    t_logits = torch.tensor(np.transpose(logits, (0, 3, 1, 2)))
    t_labels = torch.tensor(labels, dtype=torch.long)
    ref = float(F.cross_entropy(t_logits, t_labels, ignore_index=255))
    assert abs(ours - ref) < 1e-5


def test_consistency_losses_match_torch():
    rng = np.random.RandomState(3)
    ls = rng.randn(2, 8, 8, 6).astype(np.float32)
    lt = rng.randn(2, 8, 8, 6).astype(np.float32)
    js, jt = jnp.asarray(ls), jnp.asarray(lt)
    ts = torch.tensor(np.transpose(ls, (0, 3, 1, 2)))
    tt = torch.tensor(np.transpose(lt, (0, 3, 1, 2)))
    root_c = float(np.sqrt(6))

    # var
    ours = np.asarray(consistency_loss_per_pixel("var", js, jt))[..., 0]
    d = F.softmax(ts, dim=1) - F.softmax(tt, dim=1)
    ref = (d * d).sum(dim=1).numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-4)

    # logits_var
    ours = np.asarray(consistency_loss_per_pixel("logits_var", js, jt))[..., 0]
    d = ts - tt
    ref = ((d * d).sum(dim=1) / root_c).numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-4)

    # logits_smoothl1
    ours = np.asarray(consistency_loss_per_pixel("logits_smoothl1", js, jt))[..., 0]
    ref = (F.smooth_l1_loss(ts, tt, reduction="none").sum(dim=1) / root_c).numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-4)

    # kld
    ours = np.asarray(consistency_loss_per_pixel("kld", js, jt))[..., 0]
    ref = (
        F.kl_div(F.log_softmax(ts, dim=1), F.softmax(tt, dim=1), reduction="none")
        .sum(dim=1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=3e-4)

    # bce
    ours = np.asarray(consistency_loss_per_pixel("bce", js, jt))[..., 0]
    ps, pt = F.softmax(ts, dim=1), F.softmax(tt, dim=1)
    eps = 1e-6
    ref = (-(pt * torch.log(ps + eps) + (1 - pt) * torch.log(1 - ps + eps))).sum(dim=1).numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_confidence_mask_modes():
    prob = jnp.asarray(
        np.stack(
            [
                np.full((4, 4), 0.99),
                np.full((4, 4), 0.01),
            ],
            axis=-1,
        )[None]
    )
    m, rate = confidence_mask(prob, 0.97, per_pixel=True)
    assert m.shape == (1, 4, 4, 1)
    assert float(rate) == 1.0
    m2, rate2 = confidence_mask(prob, 0.995, per_pixel=False)
    assert float(m2) == 0.0 and float(rate2) == 0.0


def test_ema_update_params_and_stats():
    student = {"params": {"w": jnp.ones((3,))}, "batch_stats": {"m": jnp.zeros((3,))}}
    teacher = ema_init(student)
    student2 = {"params": {"w": jnp.full((3,), 2.0)}, "batch_stats": {"m": jnp.ones((3,))}}
    teacher = ema_update(teacher, student2, alpha=0.9)
    np.testing.assert_allclose(np.asarray(teacher["params"]["w"]), 1.1)
    np.testing.assert_allclose(np.asarray(teacher["batch_stats"]["m"]), 0.1, atol=1e-7)


def test_sigmoid_rampup():
    assert sigmoid_rampup(0, 0) == 1.0
    assert abs(sigmoid_rampup(0, 10) - np.exp(-5.0)) < 1e-9
    assert sigmoid_rampup(10, 10) == 1.0
    assert sigmoid_rampup(15, 10) == 1.0


def test_poly_schedule():
    sched = make_lr_schedule("poly", 0.1, 100, poly_power=0.9)
    assert abs(float(sched(0)) - 0.1) < 1e-8
    assert abs(float(sched(50)) - 0.1 * 0.5**0.9) < 1e-5
    assert float(sched(100)) == 0.0


def test_stepped_schedule():
    sched = make_lr_schedule(
        "stepped", 1.0, 1000, step_epochs="[2, 4]", step_gamma=0.1, iters_per_epoch=10
    )
    assert abs(float(sched(0)) - 1.0) < 1e-8
    assert abs(float(sched(25)) - 0.1) < 1e-8
    assert abs(float(sched(45)) - 0.01) < 1e-8
