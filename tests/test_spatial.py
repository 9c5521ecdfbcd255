"""Spatial partitioning (parallel/spatial.py): the image H axis sharded over
the 8-virtual-device CPU mesh must reproduce the single-device forward —
GSPMD's halo exchanges around the dilated convs / pools / resize einsums are
exercised through the full DeepLab v2 stack, not toy convs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cutmix_seg_tpu.core.schedules import make_lr_schedule
from cutmix_seg_tpu.core.train_state import OptimizerConfig, create_train_state
from cutmix_seg_tpu.eval.evaluator import make_eval_cm_fn, predict_fn
from cutmix_seg_tpu.models.common import SegModel
from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
from cutmix_seg_tpu.parallel.mesh import make_mesh
from cutmix_seg_tpu.parallel.spatial import (
    jit_spatial_forward,
    make_spatial_eval_fn,
    make_spatial_predict_fn,
    spatial_sharding,
)

C = 5


def tiny_model():
    module = DeepLab2(num_classes=C, layers=(1, 1, 1, 1))
    return SegModel(
        name="tiny_deeplab2_spatial",
        module=module,
        mean=np.asarray([0.4, 0.45, 0.5]),
        std=np.asarray([0.2, 0.25, 0.3]),
        block_size=(1, 1),
        param_label=_param_label,
    )


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=1e-4,
        lr_schedule=make_lr_schedule("none", 1e-4, 10),
    )
    state, _ = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=False, pretrained=False,
    )
    mesh = make_mesh(8)
    return model, state.student, mesh


def _raw_batch(rng, n=2, hw=(64, 48)):
    h, w = hw
    canvas = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
    labels = rng.randint(0, C, size=(n, h, w)).astype(np.int32)
    # true extents smaller than the canvas exercise the valid-mask path
    sizes = np.array(
        [[h, w]] + [[h - 1 - (i * 3) % 9, w - 1 - (i * 2) % 5]
                    for i in range(n - 1)], np.int32)
    for i, (hh, ww) in enumerate(sizes):
        labels[i, hh:, :] = 255
        labels[i, :, ww:] = 255
    return {"canvas": canvas, "labels": labels, "sizes": sizes}


def test_spatial_forward_matches_single_device(setup):
    model, mstate, mesh = setup
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 40, 3).astype(np.float32)

    # single-device reference logits
    from cutmix_seg_tpu.semisup.stepcore import apply_model
    ref, _ = apply_model(model, mstate.params, mstate.batch_stats,
                         jnp.asarray(x), train=False, freeze_bn=True)

    fwd = jit_spatial_forward(model, mesh)
    xs = jax.device_put(jnp.asarray(x), spatial_sharding(mesh))
    out = fwd(mstate, xs)
    assert out.sharding.spec == spatial_sharding(mesh).spec
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_spatial_predict_matches_single_device(setup):
    model, mstate, mesh = setup
    batch = _raw_batch(np.random.RandomState(1))

    pred_sp, y_sp = make_spatial_predict_fn(
        model, model.mean, model.std, mesh)(mstate, batch)

    # single-device reference: normalise on host exactly as the evaluator does
    from cutmix_seg_tpu.eval.evaluator import normalise_eval_batch
    x, y, _ = jax.jit(normalise_eval_batch, static_argnums=())(
        {k: jnp.asarray(v) for k, v in batch.items()},
        model.mean, model.std)
    pred_ref = predict_fn(model, mstate, x)

    np.testing.assert_array_equal(np.asarray(y_sp), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(pred_sp), np.asarray(pred_ref))


def test_spatial_eval_cm_matches_single_device(setup):
    model, mstate, mesh = setup
    batch = _raw_batch(np.random.RandomState(2))

    cm_sp = make_spatial_eval_fn(
        model, C, model.mean, model.std, mesh)(mstate, batch)

    from cutmix_seg_tpu.eval.evaluator import normalise_eval_batch
    x, y, _ = normalise_eval_batch(
        {k: jnp.asarray(v) for k, v in batch.items()},
        model.mean, model.std)
    cm_ref = make_eval_cm_fn(model, C)(mstate, {"x": x, "y": y})

    assert int(np.asarray(cm_sp).sum()) == int(np.asarray(cm_ref).sum())
    np.testing.assert_array_equal(np.asarray(cm_sp), np.asarray(cm_ref))


def test_spatial_eval_odd_height_pads_then_matches(setup):
    """H=55 does not divide by 8: pad_batch_h aligns it and the spatial CM
    equals the single-device CM on the same padded batch (padded label rows
    are 255 so they never enter the matrix)."""
    from cutmix_seg_tpu.parallel.spatial import pad_batch_h

    model, mstate, mesh = setup
    batch = _raw_batch(np.random.RandomState(3), n=2, hw=(55, 48))
    padded = pad_batch_h(batch, 8)
    assert padded["canvas"].shape[1] == 56
    np.testing.assert_array_equal(padded["labels"][:, 55:], 255)
    np.testing.assert_array_equal(padded["sizes"], batch["sizes"])

    cm_sp = make_spatial_eval_fn(
        model, C, model.mean, model.std, mesh)(mstate, padded)

    from cutmix_seg_tpu.eval.evaluator import normalise_eval_batch
    x, y, _ = normalise_eval_batch(
        {k: jnp.asarray(v) for k, v in padded.items()},
        model.mean, model.std)
    cm_ref = make_eval_cm_fn(model, C)(mstate, {"x": x, "y": y})
    np.testing.assert_array_equal(np.asarray(cm_sp), np.asarray(cm_ref))

    # already-aligned batches pass through untouched (same object contents)
    assert pad_batch_h(padded, 8)["canvas"] is padded["canvas"]


@pytest.mark.slow
def test_common_evaluate_spatial_full_pass_matches_host():
    """common.evaluate(spatial=True): a full eval pass with the H axis
    partitioned over the 8-device mesh equals an unsharded host loop. With
    block_size=(8,8) the loader already pads H to the mesh multiple, so both
    paths see bit-identical inputs."""
    from cutmix_seg_tpu.data.loader import eval_batches
    from cutmix_seg_tpu.eval.evaluator import normalise_eval_batch, make_eval_cm_fn
    from cutmix_seg_tpu.ops.iou import EvaluatorIoU
    from cutmix_seg_tpu.train import common
    from tests.test_train_step import _FakeEvalSource

    model, mstate, mesh = (tiny_model(), None, make_mesh(8))
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=1e-4,
        lr_schedule=make_lr_schedule("none", 1e-4, 10))
    state, _ = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(3), input_hw=(33, 33),
        mean_teacher=False, pretrained=False)
    mstate = state.student

    src = _FakeEvalSource(n=7, num_classes=C, seed=5)
    indices = np.arange(7)
    mean, std = src.get_mean_std()

    iou_sp = common.evaluate(
        model, mstate, src, indices, batch_size=2, mesh=mesh,
        num_classes=C, mean=mean, std=std, block_size=(8, 8), spatial=True)

    ev = EvaluatorIoU(C)
    cm_fn = make_eval_cm_fn(model, C)
    for batch in eval_batches(src, indices, 3, (8, 8)):
        x, y, _ = normalise_eval_batch(
            {k: jnp.asarray(batch[k]) for k in ("canvas", "labels", "sizes")},
            mean, std)
        ev.update_cm(np.asarray(cm_fn(mstate, {"x": x, "y": y})))
    np.testing.assert_allclose(iou_sp, ev.score())


def test_spatial_2d_mesh_batch_plus_h(setup):
    """2-D mesh (data=4, model=2): batch sharded over 'data' AND H over
    'model' — the confusion matrix still equals the single-device result."""
    model, mstate, _ = setup
    mesh2 = make_mesh(4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}

    from cutmix_seg_tpu.parallel.spatial import (
        spatial_batch_axis_size,
        spatial_h_axis_size,
        spatial_spec,
    )
    from jax.sharding import PartitionSpec as P

    assert spatial_spec(mesh2) == P("data", "model")
    assert spatial_h_axis_size(mesh2) == 2
    assert spatial_batch_axis_size(mesh2) == 4

    batch = _raw_batch(np.random.RandomState(7), n=4, hw=(32, 40))
    cm_sp = make_spatial_eval_fn(
        model, C, model.mean, model.std, mesh2)(mstate, batch)

    from cutmix_seg_tpu.eval.evaluator import normalise_eval_batch
    x, y, _ = normalise_eval_batch(
        {k: jnp.asarray(v) for k, v in batch.items()},
        model.mean, model.std)
    cm_ref = make_eval_cm_fn(model, C)(mstate, {"x": x, "y": y})
    np.testing.assert_array_equal(np.asarray(cm_sp), np.asarray(cm_ref))


def test_make_mesh_validation():
    from cutmix_seg_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError):
        make_mesh(n_model=3)          # 8 % 3 != 0
    with pytest.raises(ValueError):
        make_mesh(n_model=16)         # more model shards than devices
    with pytest.raises(ValueError):
        make_mesh(5, n_model=2)       # 10 > 8 devices
    with pytest.raises(ValueError):
        make_mesh(n_model=0)
    assert dict(make_mesh(n_model=2).shape) == {"data": 4, "model": 2}
    assert dict(make_mesh(3).shape) == {"data": 3, "model": 1}


@pytest.mark.slow
def test_spatial_train_step_matches_data_parallel():
    """jit_spatial_step: one full CutMix mean-teacher train step with
    activations partitioned batch-over-'data' x H-over-'model' (2x4 mesh)
    must reproduce the data-parallel (8x1) step — same losses, same updated
    parameters — proving the spatial mapping is a pure layout change through
    forward AND backward (grad psums + GSPMD halos), usable when one image's
    activations exceed a chip."""
    from tests import _dcn_step_common as common  # tests/ is a package
    # (tests/__init__.py guards against the reference checkout's
    # own tests/ package shadowing this directory)
    from cutmix_seg_tpu.parallel.mesh import replicated, shard_batch
    from cutmix_seg_tpu.parallel.spatial import (
        _spatial_batch_spec,
        jit_spatial_step,
    )

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (conftest)")

    batch_np = common.global_batch()  # (8, 32, 32, ...) images

    # reference: data-parallel over all 8 devices
    mesh_dp = make_mesh(8)
    _, state_dp, step_dp = common.build_step_and_state(mesh_dp)
    batch_dp = shard_batch(
        mesh_dp, {k: jnp.asarray(v) for k, v in batch_np.items()})
    state_dp, metrics_dp = common.run_two_steps(
        mesh_dp, state_dp, step_dp, batch_dp)

    # spatial: batch 2-way over 'data', image H (32 rows) 4-way
    # over 'model'
    mesh_sp = make_mesh(2, n_model=4)
    _, state_sp, step_sp = common.build_step_and_state(mesh_sp)
    jstep = jit_spatial_step(step_sp, mesh_sp, batch_np)
    sh = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            jnp.asarray(leaf),
            jax.sharding.NamedSharding(
                mesh_sp, _spatial_batch_spec(mesh_sp, np.asarray(leaf)))),
        batch_np)
    state_sp = jax.device_put(state_sp, replicated(mesh_sp))
    for _ in range(2):
        state_sp, metrics_sp = jstep(state_sp, sh, jnp.float32(1.0))
    jax.block_until_ready(metrics_sp)

    for k in metrics_dp:
        a, b = np.asarray(metrics_dp[k]), np.asarray(metrics_sp[k])
        if a.ndim == 0:
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6,
                                       err_msg=k)
    # updated student params must match too (the gradients agree)
    flat_dp, _ = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(np.asarray, state_dp.student.params))
    flat_sp, _ = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(np.asarray, state_sp.student.params))
    assert len(flat_dp) == len(flat_sp)
    for a, b in zip(flat_dp, flat_sp):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-6)
