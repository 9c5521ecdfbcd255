"""Integration tests for the fused CutMix/Cutout mean-teacher step on an
8-virtual-device CPU mesh: learning happens, EMA tracks, pi-model aliases,
cutout mode runs, metrics are finite, and sharded eval matches host eval."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cutmix_seg_tpu.core.schedules import make_lr_schedule
from cutmix_seg_tpu.core.train_state import OptimizerConfig, create_train_state
from cutmix_seg_tpu.eval.evaluator import make_eval_cm_fn
from cutmix_seg_tpu.masks.box_mask import BoxMaskConfig
from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
from cutmix_seg_tpu.models.common import SegModel
from cutmix_seg_tpu.ops.iou import EvaluatorIoU
from cutmix_seg_tpu.parallel.mesh import (
    jit_sharded_eval,
    jit_sharded_step,
    make_mesh,
    shard_batch,
)
from cutmix_seg_tpu.semisup.mask_mt import MaskConsistencyConfig, make_mask_mt_step

import numpy as _np


def tiny_model(num_classes=4) -> SegModel:
    module = DeepLab2(num_classes=num_classes, layers=(1, 1, 1, 1))
    return SegModel(
        name="tiny_deeplab2",
        module=module,
        mean=_np.zeros(3),
        std=_np.ones(3),
        block_size=(1, 1),
        param_label=_param_label,
    )


def make_batch(rng, b=8, hw=(33, 33), C=4, mode="mix"):
    h, w = hw
    sup_x = rng.randn(b, h, w, 3).astype(np.float32)
    sup_y = rng.randint(0, C, size=(b, h, w)).astype(np.int32)
    batch = {"sup_x": jnp.asarray(sup_x), "sup_y": jnp.asarray(sup_y)}
    if mode == "mix":
        for k in ("ux0", "ux1"):
            x = rng.randn(b, h, w, 3).astype(np.float32)
            batch[f"{k}_tea"] = jnp.asarray(x)
            batch[f"{k}_stu"] = jnp.asarray(x)
        batch["um0"] = jnp.ones((b, h, w, 1), jnp.float32)
        batch["um1"] = jnp.ones((b, h, w, 1), jnp.float32)
    else:
        x = rng.randn(b, h, w, 3).astype(np.float32)
        batch["ux_tea"] = jnp.asarray(x)
        batch["ux_stu"] = jnp.asarray(x)
        batch["um"] = jnp.ones((b, h, w, 1), jnp.float32)
    return batch


def _setup(mode="mix", mean_teacher=True, cons_weight=1.0, conf_thresh=0.97):
    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam",
        learning_rate=3e-4,
        lr_schedule=make_lr_schedule("none", 3e-4, 100),
    )
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=mean_teacher, pretrained=False,
    )
    cfg = MaskConsistencyConfig(
        mask_mode=mode,
        box=BoxMaskConfig((0.5, 0.5)),
        cons_weight=cons_weight,
        conf_thresh=conf_thresh,
        conf_per_pixel=False,
        freeze_bn=True,
        mean_teacher=mean_teacher,
        teacher_alpha=0.99,
    )
    # jit the step: eager (op-by-op) execution of the full train step costs
    # tens of seconds per test on this host, while the jitted program is
    # persistent-cache warm across runs
    step = jax.jit(make_mask_mt_step(model, tx, cfg))
    return model, state, step


@pytest.mark.slow
def test_mask_mt_step_runs_and_learns():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    model, state, step = _setup("mix")
    jstep = jit_sharded_step(step, mesh)
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, make_batch(rng))

    losses = []
    for i in range(5):
        state, metrics = jstep(state, batch, jnp.float32(1.0))
        losses.append(float(metrics["sup_loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["cons_loss"]))
        assert 0.0 <= float(metrics["conf_rate"]) <= 1.0
    assert int(state.step) == 5
    # same batch repeatedly: supervised loss must drop
    assert losses[-1] < losses[0], losses


def test_ema_teacher_tracks_student():
    model, state, step = _setup("mix")
    rng = np.random.RandomState(1)
    batch = make_batch(rng)
    w0_s = np.asarray(
        jax.tree_util.tree_leaves(state.student.params)[0]
    ).copy()
    state2, _ = step(state, batch, jnp.float32(1.0))
    w1_s = np.asarray(jax.tree_util.tree_leaves(state2.student.params)[0])
    w1_t = np.asarray(jax.tree_util.tree_leaves(state2.teacher.params)[0])
    # teacher = 0.99 * old_teacher(=w0 student copy) + 0.01 * new_student
    np.testing.assert_allclose(w1_t, 0.99 * w0_s + 0.01 * w1_s, atol=1e-6)


def test_pi_model_uses_student_as_teacher():
    model, state, step = _setup("mix", mean_teacher=False)
    # pi-model keeps no separate teacher state (it aliases the student)
    assert jax.tree_util.tree_leaves(state.teacher.params) == []
    rng = np.random.RandomState(2)
    state2, metrics = step(state, make_batch(rng), jnp.float32(1.0))
    assert np.isfinite(float(metrics["cons_loss"]))
    assert jax.tree_util.tree_leaves(state2.teacher.params) == []


def test_cutout_mode_runs():
    model, state, step = _setup("zero", conf_thresh=0.0)
    rng = np.random.RandomState(3)
    state2, metrics = step(state, make_batch(rng, mode="zero"), jnp.float32(0.5))
    assert np.isfinite(float(metrics["cons_loss"]))


def test_supervised_only_when_cons_weight_zero():
    model, state, step = _setup("mix", cons_weight=0.0)
    rng = np.random.RandomState(4)
    state2, metrics = step(state, make_batch(rng), jnp.float32(1.0))
    assert "cons_loss" not in metrics


def test_frozen_bn_params_get_no_updates():
    model, state, step = _setup("mix")
    rng = np.random.RandomState(5)
    state2, _ = step(state, make_batch(rng), jnp.float32(1.0))
    bn0 = np.asarray(state.student.params["backbone"]["bn1"]["scale"])
    bn1 = np.asarray(state2.student.params["backbone"]["bn1"]["scale"])
    np.testing.assert_array_equal(bn0, bn1)
    # while e.g. classifier does move
    c0 = np.asarray(state.student.params["classifier"]["aspp0"]["kernel"])
    c1 = np.asarray(state2.student.params["classifier"]["aspp0"]["kernel"])
    assert not np.array_equal(c0, c1)


class _FakeEvalSource:
    """In-memory variable-size dataset for full-pass eval tests."""

    canvas_hw = (16, 24)

    def __init__(self, n=10, num_classes=4, seed=0):
        rng = np.random.RandomState(seed)
        self.num_classes = num_classes
        self.images = [
            rng.randint(0, 255, (rng.randint(10, 17), rng.randint(12, 25), 3),
                        dtype=np.uint8) for _ in range(n)]
        self.labels = [rng.randint(0, num_classes, im.shape[:2]).astype(np.int32)
                       for im in self.images]

    def get_image(self, i):
        return self.images[i]

    def get_labels(self, i):
        return self.labels[i]

    def get_mean_std(self):
        return np.full(3, 0.5), np.full(3, 0.25)


def test_common_evaluate_sharded_full_pass_matches_host():
    """A full sharded eval pass over the 8-device mesh (batches rounded up to
    the data axis, short batch padded) must produce exactly the confusion
    matrix of an unsharded host loop with a different batch size."""
    from cutmix_seg_tpu.data.loader import eval_batches
    from cutmix_seg_tpu.eval.evaluator import normalise_eval_batch
    from cutmix_seg_tpu.ops.iou import confusion_matrix
    from cutmix_seg_tpu.semisup.mask_mt import apply_model
    from cutmix_seg_tpu.train import common

    mesh = make_mesh()
    model, state, _ = _setup("mix")
    src = _FakeEvalSource(n=10)
    indices = np.arange(10)
    mean, std = src.get_mean_std()

    iou = common.evaluate(model, state.teacher, src, indices, batch_size=3,
                          mesh=mesh, num_classes=4, mean=mean, std=std,
                          block_size=(1, 1))

    # host reference: plain jit, different batching (5), same math
    ev = EvaluatorIoU(4)
    for batch in eval_batches(src, indices, 5, (1, 1)):
        x, y, _ = normalise_eval_batch(
            {k: jnp.asarray(batch[k]) for k in ("canvas", "labels", "sizes")},
            mean, std)
        logits, _ = apply_model(model, state.teacher.params,
                                state.teacher.batch_stats, x,
                                train=False, freeze_bn=True)
        ev.update_cm(np.asarray(confusion_matrix(
            jnp.argmax(logits, -1), y, 4)))
    np.testing.assert_allclose(iou, ev.score())


def test_common_evaluate_fill_holes_path_sharded():
    """ISIC-style 2-class eval with host-side hole filling through the
    sharded predict path."""
    from cutmix_seg_tpu.train import common

    mesh = make_mesh()
    model = tiny_model(num_classes=2)
    opt_cfg = OptimizerConfig(opt_type="adam", learning_rate=3e-4,
                              lr_schedule=make_lr_schedule("none", 3e-4, 100))
    state, _ = create_train_state(model, opt_cfg, jax.random.PRNGKey(1),
                                  input_hw=(16, 24), mean_teacher=True,
                                  pretrained=False)
    src = _FakeEvalSource(n=6, num_classes=2, seed=3)
    mean, std = src.get_mean_std()
    iou = common.evaluate(model, state.teacher, src, np.arange(6),
                          batch_size=4, mesh=mesh, num_classes=2, mean=mean,
                          std=std, block_size=(1, 1), fill_holes=True)
    assert iou.shape == (2,) and np.isfinite(iou).all()


def test_sharded_eval_matches_host():
    mesh = make_mesh()
    model, state, _ = _setup("mix")
    eval_fn = make_eval_cm_fn(model, num_classes=4)
    jeval = jit_sharded_eval(eval_fn, mesh)

    rng = np.random.RandomState(6)
    x = rng.randn(8, 33, 33, 3).astype(np.float32)
    y = rng.randint(0, 4, size=(8, 33, 33)).astype(np.int32)
    y[rng.uniform(size=y.shape) < 0.05] = 255
    batch = shard_batch(mesh, {"x": jnp.asarray(x), "y": jnp.asarray(y)})
    cm = np.asarray(jeval(state.teacher, batch))

    # host path: same params, unsharded
    cm_host = np.asarray(eval_fn(state.teacher, {"x": jnp.asarray(x), "y": jnp.asarray(y)}))
    np.testing.assert_array_equal(cm, cm_host)

    ev = EvaluatorIoU(4)
    ev.update_cm(cm)
    assert np.isfinite(ev.miou())


def test_create_train_state_rounds_init_hw_to_block_size():
    """U-Net-family models (block_size (32, 32)) must init even when callers
    pass an unaligned probe size — the engine passes (65, 65) for every arch
    (regression: DenseUNet additive skips crash at odd resolutions)."""
    import flax.linen as nn

    class BlockPicky(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, freeze_bn=False):
            assert x.shape[1] % 32 == 0 and x.shape[2] % 32 == 0, x.shape
            return nn.Conv(4, (1, 1))(x)

    model = SegModel(
        name="block_picky", module=BlockPicky(), mean=_np.zeros(3),
        std=_np.ones(3), block_size=(32, 32), param_label=_param_label,
        has_batch_stats=False,
    )
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=1e-3,
        lr_schedule=make_lr_schedule("none", 1e-3, 10),
    )
    state, _ = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(65, 65),
        mean_teacher=False, pretrained=False,
    )
    assert state.student.params


def _dropout_model_and_state():
    import flax.linen as nn

    class DropNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, freeze_bn=False):
            x = nn.Conv(8, (3, 3))(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
            return nn.Conv(4, (1, 1))(x)

    model = SegModel(
        name="dropnet", module=DropNet(), mean=_np.zeros(3), std=_np.ones(3),
        block_size=(1, 1), param_label=_param_label, has_batch_stats=False,
    )
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=1e-3,
        lr_schedule=make_lr_schedule("none", 1e-3, 10),
    )
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(9, 9),
        mean_teacher=True, pretrained=False,
    )
    return model, state, tx


def test_mask_mt_step_supports_dropout_models():
    """Teacher forwards run train=True (reference parity) and must supply a
    dropout RNG — dropout-bearing models (DenseUNet, the ISIC arch) crashed
    in every algorithm step before the k_drop_tea fix. Quick bar: the
    headline (mask_mt, mix) program; the other four programs compile in the
    slow variant below."""
    model, state, tx = _dropout_model_and_state()
    rng = _np.random.RandomState(0)
    batch = make_batch(rng, b=2, hw=(9, 9), mode="mix")
    cfg = MaskConsistencyConfig(mask_mode="mix", pallas_cutmix="off",
                                cons_weight=1.0, conf_thresh=0.5,
                                freeze_bn=True, mean_teacher=True)
    s2, metrics = jax.jit(make_mask_mt_step(model, tx, cfg))(
        state, batch, jnp.float32(1.0))
    assert _np.isfinite(float(metrics["cons_loss"]))


@pytest.mark.slow
def test_all_steps_support_dropout_models():
    """Dropout-RNG regression across the remaining algorithm programs
    (mask_mt zero-mode, ICT, VAT, aug_mt) — see the quick variant above."""
    from cutmix_seg_tpu.semisup.aug_cons import AugConsConfig, make_aug_cons_step
    from cutmix_seg_tpu.semisup.ict import ICTConfig, make_ict_step
    from cutmix_seg_tpu.semisup.vat import VATConfig, make_vat_step

    model, state, tx = _dropout_model_and_state()
    rng = _np.random.RandomState(0)
    ramp = jnp.float32(1.0)
    common = dict(cons_weight=1.0, conf_thresh=0.5, freeze_bn=True,
                  mean_teacher=True)

    batch = make_batch(rng, b=2, hw=(9, 9), mode="zero")
    cfg = MaskConsistencyConfig(mask_mode="zero", pallas_cutmix="off",
                                **common)
    s2, metrics = jax.jit(make_mask_mt_step(model, tx, cfg))(
        state, batch, ramp)
    assert _np.isfinite(float(metrics["cons_loss"]))

    batch = make_batch(rng, b=2, hw=(9, 9), mode="mix")
    s2, metrics = jax.jit(make_ict_step(model, tx, ICTConfig(
        ict_alpha=0.1, **common)))(state, batch, ramp)
    assert _np.isfinite(float(metrics["cons_loss"]))

    batch = make_batch(rng, b=2, hw=(9, 9), mode="zero")
    s2, metrics = jax.jit(make_vat_step(model, tx, VATConfig(
        vat_radius=0.1, **common)))(state, batch, ramp)
    assert _np.isfinite(float(metrics["cons_loss"]))

    b = make_batch(rng, b=2, hw=(9, 9), mode="mix")
    batch = {"sup_x": b["sup_x"], "sup_y": b["sup_y"], "ux0": b["ux0_tea"],
             "ux1": b["ux1_tea"], "um0": b["um0"], "um1": b["um1"],
             "xf0_to_1": jnp.tile(jnp.asarray([[[1.0, 0, 0], [0, 1.0, 0]]],
                                              jnp.float32), (2, 1, 1))}
    s2, metrics = jax.jit(make_aug_cons_step(model, tx, AugConsConfig(
        **common)))(state, batch, ramp)
    assert _np.isfinite(float(metrics["cons_loss"]))


@pytest.mark.parametrize(
    "mode,conf",
    [pytest.param("mix", 0.0, marks=pytest.mark.slow),
     # all variants are slow-tier (two full-step compiles each, ~34s on the
     # 1-core quick-bar host); the quick bar keeps accum coverage via
     # test_grad_accum_training_bn_sequential_stats + the guards test
     pytest.param("mix", 0.5, marks=pytest.mark.slow),
     pytest.param("zero", 0.0, marks=pytest.mark.slow)])
def test_grad_accum_equivalent_to_single_step(mode, conf):
    """grad_accum=2 must reproduce the unchunked step: identical mask stream
    (full-batch sampling), gradient = mean of chunk gradients == unchunked
    gradient when reductions are chunk-decomposable (R=1, per-pixel conf)."""
    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-4,
        lr_schedule=make_lr_schedule("none", 3e-4, 100))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=True, pretrained=False)
    rng = _np.random.RandomState(0)
    batch = make_batch(rng, b=4, hw=(17, 17), mode=mode)
    ramp = jnp.float32(1.0)

    common = dict(mask_mode=mode, cons_weight=1.0, conf_thresh=conf,
                  conf_per_pixel=True, freeze_bn=True, mean_teacher=True,
                  pallas_cutmix="off")
    s1, m1 = jax.jit(make_mask_mt_step(
        model, tx, MaskConsistencyConfig(**common)))(state, batch, ramp)
    s2, m2 = jax.jit(make_mask_mt_step(
        model, tx, MaskConsistencyConfig(grad_accum=2, **common)))(
        state, batch, ramp)

    for k in m1:
        _np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4,
                                    err_msg=k)
    p1 = jax.tree_util.tree_leaves(s1.student.params)
    p2 = jax.tree_util.tree_leaves(s2.student.params)
    for a, b in zip(p1, p2):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                    atol=5e-5, rtol=2e-3)
    # EMA teacher advanced identically too
    t1 = jax.tree_util.tree_leaves(s1.teacher.params)
    t2 = jax.tree_util.tree_leaves(s2.teacher.params)
    for a, b in zip(t1, t2):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                    atol=5e-5, rtol=2e-3)


def test_grad_accum_validation():
    from cutmix_seg_tpu.semisup.aug_cons import AugConsConfig, make_aug_cons_step
    from cutmix_seg_tpu.semisup.ict import ICTConfig, make_ict_step
    from cutmix_seg_tpu.semisup.vat import VATConfig, make_vat_step

    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-4,
        lr_schedule=make_lr_schedule("none", 3e-4, 100))
    _, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=True, pretrained=False)
    with pytest.raises(ValueError, match="unsup_batch_ratio"):
        make_mask_mt_step(model, tx, MaskConsistencyConfig(
            grad_accum=2, freeze_bn=True, unsup_batch_ratio=2))
    for make, cfg_cls in ((make_ict_step, ICTConfig),
                          (make_vat_step, VATConfig),
                          (make_aug_cons_step, AugConsConfig)):
        with pytest.raises(ValueError, match="unsup_batch_ratio"):
            make(model, tx, cfg_cls(grad_accum=2, freeze_bn=True,
                                    unsup_batch_ratio=2))
    # training BN is a SUPPORTED accum mode now (per-chunk stat updates)
    step = make_mask_mt_step(model, tx, MaskConsistencyConfig(
        grad_accum=2, freeze_bn=False, conf_thresh=0.0))
    assert callable(step)


def test_grad_accum_guards_and_warning():
    """Accum path parity guards: unknown mask_mode raises the same explicit
    error as K=1, crop-shape mismatch raises a pointed error, and the
    batch-mean confidence gate emits the semantics warning at build time."""
    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-4,
        lr_schedule=make_lr_schedule("none", 3e-4, 100))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=True, pretrained=False)
    rng = _np.random.RandomState(0)
    ramp = jnp.float32(1.0)
    common = dict(cons_weight=1.0, freeze_bn=True, mean_teacher=True,
                  pallas_cutmix="off", grad_accum=2)

    step = make_mask_mt_step(model, tx, MaskConsistencyConfig(
        mask_mode="bogus", conf_thresh=0.0, **common))
    with pytest.raises(ValueError, match="unknown mask_mode"):
        step(state, make_batch(rng, b=4, hw=(17, 17), mode="mix"), ramp)

    # the loss-chain HBM options are not wired through the accum chunk
    # losses: the combination must be rejected, not parsed-and-ignored
    for extra in ({"remat_loss_chain": True},
                  {"cons_compute_dtype": "bfloat16"}):
        with pytest.raises(ValueError, match="not supported with grad_accum"):
            make_mask_mt_step(model, tx, MaskConsistencyConfig(
                mask_mode="mix", conf_thresh=0.0, **common, **extra))

    step = make_mask_mt_step(model, tx, MaskConsistencyConfig(
        mask_mode="mix", conf_thresh=0.0, **common))
    batch = make_batch(rng, b=4, hw=(17, 17), mode="mix")
    batch["sup_x"] = batch["sup_x"][:, :9, :9]  # sup crop != unsup crop
    batch["sup_y"] = batch["sup_y"][:, :9, :9]
    with pytest.raises(ValueError, match="matching supervised"):
        step(state, batch, ramp)

    with pytest.warns(UserWarning, match="batch-mean confidence gate"):
        make_mask_mt_step(model, tx, MaskConsistencyConfig(
            mask_mode="mix", conf_thresh=0.97, conf_per_pixel=False,
            **common))


@pytest.mark.slow
def test_loss_chain_variants_match_reference_step():
    """remat_loss_chain must be BIT-exact vs the default step (identical
    math, only backward rematerialisation changes); cons_compute_dtype=
    'bfloat16' must stay within bf16 quantisation of it (parity-flagged
    HBM-traffic optimisation; semisup/mask_mt.py config docs).

    Slow tier: five distinct full-step compiles (~74s on the 1-core
    quick-bar host). The adopted bench flags (remat + bf16 softmax) are
    still quick-covered via the CLI flag tests and the default-step tests;
    this parity matrix runs in the full (merge-bar) suite."""
    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-4,
        lr_schedule=make_lr_schedule("none", 3e-4, 100))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=True, pretrained=False)
    # teacher == student at init makes cons_loss degenerate (~1e-12), so the
    # dtype comparisons below would compare rounding noise against rounding
    # noise; perturb the teacher deterministically so the consistency chain
    # carries a non-trivial signal for every variant
    state = state.replace(teacher=state.teacher.replace(
        params=jax.tree_util.tree_map(
            lambda p: p + 0.05 * jnp.sin(
                jnp.arange(p.size, dtype=jnp.float32)).reshape(p.shape),
            state.teacher.params)))
    rng = _np.random.RandomState(0)
    batch = make_batch(rng, b=4, hw=(17, 17), mode="mix")
    ramp = jnp.float32(1.0)
    common = dict(mask_mode="mix", cons_weight=1.0, conf_thresh=0.0,
                  conf_per_pixel=False, freeze_bn=True, mean_teacher=True,
                  pallas_cutmix="off")

    s_ref, m_ref = jax.jit(make_mask_mt_step(
        model, tx, MaskConsistencyConfig(**common)))(state, batch, ramp)

    s_rm, m_rm = jax.jit(make_mask_mt_step(
        model, tx, MaskConsistencyConfig(remat_loss_chain=True, **common)))(
        state, batch, ramp)
    for k in m_ref:
        assert float(m_rm[k]) == float(m_ref[k]), k
    for a, b in zip(jax.tree_util.tree_leaves(s_rm.student.params),
                    jax.tree_util.tree_leaves(s_ref.student.params)):
        _np.testing.assert_array_equal(_np.asarray(a), _np.asarray(b))

    s_bf, m_bf = jax.jit(make_mask_mt_step(
        model, tx, MaskConsistencyConfig(
            cons_compute_dtype="bfloat16", remat_loss_chain=True, **common)))(
        state, batch, ramp)
    _np.testing.assert_allclose(float(m_bf["cons_loss"]),
                                float(m_ref["cons_loss"]), rtol=2e-2)
    _np.testing.assert_allclose(float(m_bf["sup_loss"]),
                                float(m_ref["sup_loss"]), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_bf.student.params),
                    jax.tree_util.tree_leaves(s_ref.student.params)):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                    atol=1e-4)

    # loss_softmax_dtype='bfloat16': the softmax chains THEMSELVES in bf16
    # (pixel sums still f32); stays within bf16 quantisation of the default
    s_sm, m_sm = jax.jit(make_mask_mt_step(
        model, tx, MaskConsistencyConfig(
            loss_softmax_dtype="bfloat16", **common)))(state, batch, ramp)
    _np.testing.assert_allclose(float(m_sm["cons_loss"]),
                                float(m_ref["cons_loss"]), rtol=2e-2)
    _np.testing.assert_allclose(float(m_sm["sup_loss"]),
                                float(m_ref["sup_loss"]), rtol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_sm.student.params),
                    jax.tree_util.tree_leaves(s_ref.student.params)):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                    atol=2e-4)
    # and it composes with remat (checkpoint static-arg plumbing)
    s_sr, m_sr = jax.jit(make_mask_mt_step(
        model, tx, MaskConsistencyConfig(
            loss_softmax_dtype="bfloat16", remat_loss_chain=True,
            **common)))(state, batch, ramp)
    _np.testing.assert_allclose(float(m_sr["cons_loss"]),
                                float(m_sm["cons_loss"]), rtol=1e-6)


def _algo_step_and_batch(algo, model, tx, rng, grad_accum=1, freeze_bn=True,
                         cons_weight=1.0):
    """(step, batch) for any of the four algorithms at K=grad_accum."""
    from cutmix_seg_tpu.semisup.aug_cons import AugConsConfig, make_aug_cons_step
    from cutmix_seg_tpu.semisup.ict import ICTConfig, make_ict_step
    from cutmix_seg_tpu.semisup.vat import VATConfig, make_vat_step

    common = dict(cons_weight=cons_weight, conf_thresh=0.5,
                  conf_per_pixel=True, freeze_bn=freeze_bn, mean_teacher=True,
                  grad_accum=grad_accum)
    if algo == "mask_mt":
        step = make_mask_mt_step(model, tx, MaskConsistencyConfig(
            mask_mode="mix", pallas_cutmix="off", **common))
        batch = make_batch(rng, b=4, hw=(17, 17), mode="mix")
    elif algo == "ict":
        step = make_ict_step(model, tx, ICTConfig(ict_alpha=0.1, **common))
        batch = make_batch(rng, b=4, hw=(17, 17), mode="mix")
    elif algo == "vat_mt":
        step = make_vat_step(model, tx, VATConfig(
            vat_radius=0.1, adaptive_vat_radius=True, **common))
        batch = make_batch(rng, b=4, hw=(17, 17), mode="zero")
    else:  # aug_mt
        step = make_aug_cons_step(model, tx, AugConsConfig(**common))
        b = make_batch(rng, b=4, hw=(17, 17), mode="mix")
        # small per-sample translations in grid space
        xf = np.tile(np.asarray([[[1.0, 0, 0], [0, 1.0, 0]]], np.float32),
                     (4, 1, 1))
        xf[:, 0, 2] = rng.uniform(-0.2, 0.2, size=4)
        xf[:, 1, 2] = rng.uniform(-0.2, 0.2, size=4)
        batch = {"sup_x": b["sup_x"], "sup_y": b["sup_y"],
                 "ux0": b["ux0_tea"], "ux1": b["ux1_tea"],
                 "um0": b["um0"], "um1": b["um1"],
                 "xf0_to_1": jnp.asarray(xf)}
    return step, batch


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["ict", "vat_mt", "aug_mt"])
def test_grad_accum_equivalent_other_algorithms(algo):
    """K=2 accumulation must reproduce the K=1 step for ICT / VAT / aug_mt
    when the reductions decompose (frozen BN, per-pixel confidence, R=1,
    dropout-free model): same Beta/noise stream (full-batch draws), gradient
    = mean of chunk gradients == unchunked gradient up to f32 order."""
    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-4,
        lr_schedule=make_lr_schedule("none", 3e-4, 100))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=True, pretrained=False)
    ramp = jnp.float32(1.0)

    rng = _np.random.RandomState(7)
    step1, batch = _algo_step_and_batch(algo, model, tx, rng, grad_accum=1)
    rng = _np.random.RandomState(7)
    step2, batch2 = _algo_step_and_batch(algo, model, tx, rng, grad_accum=2)

    s1, m1 = jax.jit(step1)(state, batch, ramp)
    s2, m2 = jax.jit(step2)(state, batch2, ramp)

    for k in m1:
        _np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4,
                                    err_msg=f"{algo}:{k}")
    for a, b in zip(jax.tree_util.tree_leaves(s1.student.params),
                    jax.tree_util.tree_leaves(s2.student.params)):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                    atol=5e-5, rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s1.teacher.params),
                    jax.tree_util.tree_leaves(s2.teacher.params)):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                    atol=5e-5, rtol=2e-3)


def test_grad_accum_training_bn_sequential_stats():
    """Training-BN accumulation: student batch statistics must equal
    threading the SAME chunk forwards sequentially (the K-sequential-small-
    batches semantics) — verified against direct apply_model calls on the
    strided chunks (supervised-only isolates the student stats path)."""
    from cutmix_seg_tpu.semisup.stepcore import apply_model

    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-4,
        lr_schedule=make_lr_schedule("none", 3e-4, 100))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=True, pretrained=False)
    assert state.student.batch_stats, "model must carry BN stats"
    rng = _np.random.RandomState(3)
    batch = make_batch(rng, b=4, hw=(17, 17), mode="mix")

    step = make_mask_mt_step(model, tx, MaskConsistencyConfig(
        mask_mode="mix", pallas_cutmix="off", cons_weight=0.0,
        conf_thresh=0.0, freeze_bn=False, mean_teacher=True, grad_accum=2))
    s2, metrics = jax.jit(step)(state, batch, jnp.float32(1.0))
    assert _np.isfinite(float(metrics["sup_loss"]))

    japply = jax.jit(
        lambda p, st, x: apply_model(model, p, st, x, train=True,
                                     freeze_bn=False))
    expect = state.student.batch_stats
    for k in range(2):
        _, expect = japply(state.student.params, expect, batch["sup_x"][k::2])
    for a, b in zip(jax.tree_util.tree_leaves(s2.student.batch_stats),
                    jax.tree_util.tree_leaves(expect)):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                    atol=1e-5, rtol=1e-4)
    # stats actually moved
    moved = any(
        not _np.allclose(_np.asarray(a), _np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s2.student.batch_stats),
                        jax.tree_util.tree_leaves(state.student.batch_stats)))
    assert moved


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["mask_mt", "ict", "vat_mt", "aug_mt"])
def test_grad_accum_training_bn_runs_all_algorithms(algo):
    # quick bar: training-BN accumulation semantics are covered by
    # test_grad_accum_training_bn_sequential_stats; these are smoke runs
    """K=2 with TRAINING BatchNorm (the DenseUNet/ISIC recipe shape) runs for
    every algorithm: finite metrics, advanced step, teacher stats updated by
    the consistency branch's teacher forwards."""
    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=3e-4,
        lr_schedule=make_lr_schedule("none", 3e-4, 100))
    state, tx = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=True, pretrained=False)
    rng = _np.random.RandomState(11)
    step, batch = _algo_step_and_batch(algo, model, tx, rng, grad_accum=2,
                                       freeze_bn=False)
    s2, metrics = jax.jit(step)(state, batch, jnp.float32(1.0))
    assert int(s2.step) == 1
    for k in ("sup_loss", "cons_loss", "conf_rate"):
        assert _np.isfinite(float(metrics[k])), (algo, k)
    tea_moved = any(
        not _np.allclose(_np.asarray(a), _np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s2.teacher.batch_stats),
                        jax.tree_util.tree_leaves(state.teacher.batch_stats)))
    assert tea_moved, algo
