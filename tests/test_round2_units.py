"""Unit coverage for round-2 machinery: fast frozen BN, replicated sharded
predict, shard_global_batch, and the profiler trace context."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from cutmix_seg_tpu.models.common import _FastFrozenBN, batch_norm
from cutmix_seg_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_global_batch,
)


def test_fast_frozen_bn_matches_flax_within_bf16():
    """The compute-dtype affine must match flax's f32-normalise-then-round
    BatchNorm to bf16 rounding tolerance, with identical variable structure."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    ref = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.bfloat16)
    v = ref.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(1).uniform(0.5, 1.5, a.shape).astype(np.float32)),
        v)
    fast = batch_norm(True, "bn", jnp.bfloat16)
    assert isinstance(fast, _FastFrozenBN)
    assert (jax.tree_util.tree_structure(fast.init(jax.random.PRNGKey(0), x))
            == jax.tree_util.tree_structure(v))
    y_ref = np.asarray(ref.apply(v, x.astype(jnp.bfloat16)), np.float32)
    y_fast = np.asarray(fast.apply(v, x.astype(jnp.bfloat16)), np.float32)
    np.testing.assert_allclose(y_fast, y_ref, atol=0.02)

    # f32 / training paths keep exact flax BatchNorm semantics
    assert isinstance(batch_norm(True, "bn", None), nn.BatchNorm)
    assert isinstance(batch_norm(False, "bn", jnp.bfloat16), nn.BatchNorm)


def test_sharded_predict_outputs_replicated_and_correct():
    """Predict outputs must be fully replicated (fetchable on any host) and
    match the unsharded argmax."""
    from cutmix_seg_tpu.eval.evaluator import (
        make_sharded_predict_fn,
        normalise_eval_batch,
    )
    from cutmix_seg_tpu.semisup.mask_mt import apply_model
    from tests.test_train_step import _setup

    mesh = make_mesh()
    model, state, _ = _setup("mix")
    mean, std = np.full(3, 0.5), np.full(3, 0.25)
    rng = np.random.RandomState(2)
    batch = {
        "canvas": rng.randint(0, 255, (8, 16, 24, 3), np.uint8),
        "labels": rng.randint(0, 4, (8, 16, 24)).astype(np.uint8),
        "sizes": np.tile(np.int32([16, 24]), (8, 1)),
    }
    predict = make_sharded_predict_fn(model, mean, std, mesh)
    sb = shard_batch(mesh, batch)
    pred, y = predict(state.teacher, sb)
    assert pred.sharding.is_fully_replicated
    assert y.sharding.is_fully_replicated

    x, y_ref, _ = normalise_eval_batch(
        {k: jnp.asarray(v) for k, v in batch.items()}, mean, std)
    logits, _ = apply_model(model, state.teacher.params,
                            state.teacher.batch_stats, x,
                            train=False, freeze_bn=True)
    np.testing.assert_array_equal(np.asarray(pred),
                                  np.asarray(jnp.argmax(logits, -1)))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))


def test_shard_global_batch_single_process_equals_shard_batch():
    mesh = make_mesh()
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    a = shard_batch(mesh, {"x": x})["x"]
    b = shard_global_batch(mesh, {"x": x})["x"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert b.sharding == batch_sharding(mesh)


def test_profiler_trace_writes_artifacts(tmp_path):
    from cutmix_seg_tpu.utils.profiling import trace

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        _ = jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "profiler trace produced no files"

    with trace(None):  # no-op path
        pass


def test_compile_cache_env_precedence(tmp_path, monkeypatch):
    from cutmix_seg_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    # kill switch wins
    monkeypatch.setenv("CUTMIX_SEG_NO_COMPILATION_CACHE", "1")
    assert enable_persistent_compilation_cache(str(tmp_path / "a")) is None
    monkeypatch.delenv("CUTMIX_SEG_NO_COMPILATION_CACHE")

    # standard jax knob wins over the explicit arg
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "jaxdir"))
    got = enable_persistent_compilation_cache(str(tmp_path / "b"))
    assert got == str(tmp_path / "jaxdir") and os.path.isdir(got)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")

    # explicit arg otherwise
    got = enable_persistent_compilation_cache(str(tmp_path / "c"))
    assert got == str(tmp_path / "c") and os.path.isdir(got)
