"""Unit tests for core infrastructure: checkpoints, job runner, loader
shuffling, colour-jitter identity behaviour, pallas multi-box/bf16."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from cutmix_seg_tpu.core import checkpoint as ckpt
from cutmix_seg_tpu.core import job


def test_checkpoint_roundtrip_and_prune(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.int32(7)}
    d = str(tmp_path / "ckpts")
    for s in (1, 2, 3):
        ckpt.save_checkpoint(d, state, step=s, keep=2)
    files = sorted(os.listdir(d))
    assert files == ["ckpt_000000002.msgpack", "ckpt_000000003.msgpack"]
    latest = ckpt.latest_checkpoint(d)
    assert latest.endswith("ckpt_000000003.msgpack")

    template = {"params": {"w": jnp.zeros((2, 3))}, "step": jnp.int32(0)}
    restored = ckpt.restore_checkpoint(latest, template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_checkpoint_async_roundtrip_and_error(tmp_path):
    """save_checkpoint_async: the background write must produce the same
    bytes a synchronous save would, joins bound the in-flight count to one,
    and writer errors surface on the next wait."""
    import pytest
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.int32(7)}
    d = str(tmp_path / "ckpts_async")
    for s in (1, 2, 3):
        ckpt.save_checkpoint_async(d, state, step=s, keep=2)
    ckpt.wait_pending_saves()
    files = sorted(os.listdir(d))
    assert files == ["ckpt_000000002.msgpack", "ckpt_000000003.msgpack"]
    sync_path = ckpt.save_checkpoint(str(tmp_path / "sync"), state, step=3)
    a = open(ckpt.latest_checkpoint(d), "rb").read()
    assert a == open(sync_path, "rb").read()

    # an error raised INSIDE the background writer thread (serialisation of
    # an unserialisable leaf) must surface on the next wait, not vanish
    d_err = str(tmp_path / "ckpts_err")
    ckpt.save_checkpoint_async(d_err, {"w": object()}, step=9)
    with pytest.raises(Exception):
        ckpt.wait_pending_saves(d_err)
    ckpt.wait_pending_saves()  # idempotent after the error drained

    # and a synchronous failure (checkpoint dir path is a file) raises on
    # the caller thread directly
    blocker = str(tmp_path / "not_a_dir")
    open(blocker, "w").write("file, not dir")
    with pytest.raises(OSError):
        ckpt.save_checkpoint_async(blocker, state, step=9)

    # per-directory isolation: a healthy writer in another dir is unaffected
    d_ok = str(tmp_path / "ckpts_ok")
    ckpt.save_checkpoint_async(d_ok, state, step=1)
    ckpt.wait_pending_saves(d_ok)
    assert ckpt.latest_checkpoint(d_ok)


def test_export_params(tmp_path):
    path = str(tmp_path / "model.msgpack")
    ckpt.export_params(path, {"k": jnp.ones(4)})
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_job_runner_log_and_metrics(tmp_path):
    def fn(ctx, x):
        print("hello from job")
        ctx.log_metrics({"epoch": 1, "val": x})
        return x * 2

    out = job.submit("jobname", "desc1", fn, {"x": 21},
                     results_root=str(tmp_path))
    assert out == 42
    run_dir = tmp_path / "jobname" / "desc1"
    assert "hello from job" in (run_dir / "log_desc1.txt").read_text()
    import json

    rec = json.loads((run_dir / "metrics_desc1.jsonl").read_text().splitlines()[0])
    assert rec["val"] == 21 and "time" in rec
    # duplicate skip
    assert job.submit("jobname", "desc1", fn, {"x": 1},
                      results_root=str(tmp_path)) is None

    # an explicit resume targets the SAME run dir (the checkpoints live
    # there), so it must override the already-run dedup and append the log
    def fn_resume(ctx, x, resume):
        print("resumed pass")
        return x

    assert job.submit("jobname", "desc1", fn_resume,
                      {"x": 7, "resume": True},
                      results_root=str(tmp_path)) == 7
    log = (run_dir / "log_desc1.txt").read_text()
    assert "hello from job" in log and "resumed pass" in log


def test_colour_jitter_identity_when_zero_ranges():
    from cutmix_seg_tpu.ops.colour import ColourJitterConfig, colour_jitter

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0.1, 0.9, size=(4, 8, 8, 3)).astype(np.float32))
    cfg = ColourJitterConfig(brightness=0.0, contrast=0.0, saturation=0.0,
                             hue=0.0, apply_prob=1.0, greyscale_prob=0.0)
    out = np.asarray(colour_jitter(img, jax.random.PRNGKey(0), cfg))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-5)


def test_pallas_multibox_bf16():
    from cutmix_seg_tpu.masks.box_mask import (
        BoxMaskConfig, rasterise_masks, sample_box_rects)
    from cutmix_seg_tpu.ops.pallas_cutmix import cutmix_blend

    rng = np.random.RandomState(1)
    n, h, w, c = 3, 32, 32, 3
    x0 = jnp.asarray(rng.randn(n, h, w, c)).astype(jnp.bfloat16)
    x1 = jnp.asarray(rng.randn(n, h, w, c)).astype(jnp.bfloat16)
    cfg = BoxMaskConfig((0.2, 0.6), n_boxes=3)
    rects = sample_box_rects(cfg, jax.random.PRNGKey(2), n, (h, w))
    mix, m = cutmix_blend(x0, x1, rects, invert=True, interpret=True)
    m_ref = rasterise_masks(rects, (h, w), invert=True, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(m, np.float32), np.asarray(m_ref, np.float32))
    mix_ref = x0 * (1 - m_ref) + x1 * m_ref
    np.testing.assert_allclose(np.asarray(mix, np.float32),
                               np.asarray(mix_ref, np.float32), atol=1e-2)


def test_settings_ini_and_dnnlib_template(monkeypatch, tmp_path):
    """INI [paths] contract + the optional dnnlib-template fallback
    (reference: settings.py:16-49)."""
    import sys
    import types

    from cutmix_seg_tpu.data import settings

    cfg = tmp_path / "semantic_segmentation.cfg"
    d = tmp_path / "voc"
    d.mkdir()
    cfg.write_text(f"[paths]\npascal_voc = {d}\n")
    monkeypatch.setenv("CUTMIX_SEG_CONFIG", str(cfg))
    monkeypatch.setattr(settings, "_config", None)
    assert settings.get_data_path("pascal_voc") == str(d)

    # dnnlib absent: template ignored, INI used
    assert settings.get_data_path(
        "pascal_voc", dnnlib_template="<DATA>/voc") == str(d)

    # dnnlib present: template resolution wins (reference: settings.py:45-49)
    mod = types.ModuleType("dnnlib")
    sub = types.ModuleType("dnnlib.submission")
    subm = types.ModuleType("dnnlib.submission.submit")
    subm.get_path_from_template = lambda t: f"/resolved/{t}"
    sub.submit = subm
    mod.submission = sub
    monkeypatch.setitem(sys.modules, "dnnlib", mod)
    monkeypatch.setitem(sys.modules, "dnnlib.submission", sub)
    monkeypatch.setitem(sys.modules, "dnnlib.submission.submit", subm)
    assert settings.get_data_path(
        "pascal_voc", exists=False,
        dnnlib_template="<DATA>/voc") == "/resolved/<DATA>/voc"
    # exists validation applies to the template resolution too
    import pytest

    with pytest.raises(RuntimeError):
        settings.get_data_path("pascal_voc", dnnlib_template="<DATA>/voc")


def test_device_probe_paths():
    """probe_device_count must map every failure mode to 0 (the callers'
    fall-back signal) and parse a healthy probe's count; the probe program
    is injected because the real one's duration is the backend's to decide
    (bench.py / __graft_entry__ use it to survive TPU-tunnel outages)."""
    from cutmix_seg_tpu.utils.device_probe import (
        probe_device_count,
        probe_devices,
    )

    assert probe_device_count(code="print(3)") == 3
    # import-time banners before the count must not break the parse
    assert probe_device_count(code="print('plugin banner'); print(4)") == 4
    assert probe_device_count(code="raise SystemExit(1)") == 0  # init crash
    assert probe_device_count(code="print('garbage')") == 0     # bad stdout
    assert probe_device_count(code="print()") == 0              # empty stdout
    # the failure diagnostic carries the probe's last stderr line (libtpu
    # 'device in use' vs tunnel timeout are different operator actions)
    n, diag = probe_devices(
        code="import sys; print('chip held', file=sys.stderr); "
             "raise SystemExit(1)")
    assert n == 0 and "chip held" in diag
    # tunnel hang: exceeds the timeout -> 0, promptly
    import time
    t0 = time.time()
    n, diag = probe_devices(timeout_s=1, code="import time; time.sleep(30)")
    assert n == 0 and "tunnel" in diag
    assert time.time() - t0 < 10
    # this test process initialised its (8-virtual-CPU) backend long ago:
    # the default probe must answer from it without a subprocess — a
    # subprocess could not acquire a single-client TPU the parent holds
    t0 = time.time()
    assert probe_device_count() == 8
    assert time.time() - t0 < 2
