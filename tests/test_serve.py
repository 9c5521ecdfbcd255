"""Serving export (serve/export.py + tools/export_model.py): AOT artifacts
round-trip through serialize/deserialize, serve any batch size via the
symbolic batch dim, and reproduce the in-framework forward exactly."""

import json
import pytest
import os

import numpy as np
import jax
import jax.numpy as jnp

from cutmix_seg_tpu.core.checkpoint import export_params, restore_checkpoint
from cutmix_seg_tpu.core.schedules import make_lr_schedule
from cutmix_seg_tpu.core.train_state import ModelState, OptimizerConfig, create_train_state
from cutmix_seg_tpu.models.common import SegModel
from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label
from cutmix_seg_tpu.serve.export import (
    export_serving_artifact,
    load_serving_artifact,
    make_serving_fn,
)

C = 4


def tiny_model():
    module = DeepLab2(num_classes=C, layers=(1, 1, 1, 1))
    return SegModel(
        name="tiny_deeplab2_serve",
        module=module,
        mean=np.asarray([0.4, 0.45, 0.5]),
        std=np.asarray([0.2, 0.25, 0.3]),
        block_size=(1, 1),
        param_label=_param_label,
    )


def _state(model):
    opt_cfg = OptimizerConfig(
        opt_type="adam", learning_rate=1e-4,
        lr_schedule=make_lr_schedule("none", 1e-4, 10))
    state, _ = create_train_state(
        model, opt_cfg, jax.random.PRNGKey(0), input_hw=(33, 33),
        mean_teacher=False, pretrained=False)
    return state.student


def test_export_roundtrip_symbolic_batch(tmp_path):
    model = tiny_model()
    mstate = _state(model)
    hw = (40, 48)
    path = str(tmp_path / "tiny.jaxexport")
    export_serving_artifact(model, mstate, hw, path, num_classes=C,
                            platforms=("cpu",))

    call, meta = load_serving_artifact(path)
    assert meta["input_hw"] == list(hw) and meta["output"] == "argmax"
    assert meta["num_classes"] == C and meta["bytes"] == os.path.getsize(path)

    serve_ref = make_serving_fn(model, mstate)
    rng = np.random.RandomState(0)
    for b in (1, 3):  # symbolic batch: one artifact, multiple batch sizes
        x = rng.randint(0, 256, size=(b,) + hw + (3,)).astype(np.uint8)
        got = np.asarray(call(x))
        ref = np.asarray(serve_ref(jnp.asarray(x)))
        assert got.shape == (b,) + hw
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, ref)


def test_export_logits_output(tmp_path):
    model = tiny_model()
    mstate = _state(model)
    path = str(tmp_path / "tiny_logits.jaxexport")
    export_serving_artifact(model, mstate, (33, 33), path, output="logits",
                            platforms=("cpu",))
    call, meta = load_serving_artifact(path)
    x = np.random.RandomState(1).randint(
        0, 256, size=(2, 33, 33, 3)).astype(np.uint8)
    logits = np.asarray(call(x)).astype(np.float32)
    assert logits.shape == (2, 33, 33, C)
    ref = np.asarray(make_serving_fn(model, mstate, output="logits")(
        jnp.asarray(x))).astype(np.float32)
    np.testing.assert_allclose(logits, ref, rtol=1e-6, atol=1e-6)


def test_export_cli_with_saved_params(tmp_path, monkeypatch):
    """The CLI path: export_params -> export_model CLI -> load -> predictions
    equal the in-framework forward with the restored weights."""
    from click.testing import CliRunner

    from cutmix_seg_tpu.models import registry
    from cutmix_seg_tpu.tools.export_model import main as cli

    model = tiny_model()
    mstate = _state(model)
    params_path = str(tmp_path / "model.msgpack")
    export_params(params_path, mstate)

    # register the tiny arch so the CLI can build it by name
    registry.register("tiny_deeplab2_serve_test")(
        lambda num_classes, dtype=None, pretrained=True: tiny_model())

    out_path = str(tmp_path / "cli.jaxexport")
    res = CliRunner().invoke(cli, [
        "--arch", "tiny_deeplab2_serve_test", "--num_classes", str(C),
        "--params", params_path, "--hw", "33,33", "--out", out_path,
        "--platforms", "cpu", "--dtype", "float32",
    ])
    assert res.exit_code == 0, res.output

    call, meta = load_serving_artifact(out_path)
    x = np.random.RandomState(2).randint(
        0, 256, size=(2, 33, 33, 3)).astype(np.uint8)
    ref = make_serving_fn(model, mstate)(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(call(x)), np.asarray(ref))
    with open(out_path + ".json") as f:
        assert json.load(f)["model"] == "tiny_deeplab2_serve"


def test_http_serving_host_roundtrip(tmp_path):
    """The std-lib HTTP host (scripts/serve_http.py) serves an exported
    artifact: /healthz returns the metadata, /predict maps PNG -> label PNG
    matching the in-framework forward."""
    import importlib.util
    import io
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from PIL import Image

    spec = importlib.util.spec_from_file_location(
        "serve_http", os.path.join(os.path.dirname(__file__), "..",
                                   "scripts", "serve_http.py"))
    serve_http = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_http)

    model = tiny_model()
    mstate = _state(model)
    path = str(tmp_path / "t.jaxexport")
    export_serving_artifact(model, mstate, (33, 33), path, num_classes=C,
                            platforms=("cpu",))
    call, meta = load_serving_artifact(path)

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_http.make_handler(call, meta))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            got_meta = json.loads(r.read())
        assert got_meta["input_hw"] == [33, 33]

        x = np.random.RandomState(3).randint(
            0, 256, size=(33, 33, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(x).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=60) as r:
            pred_png = r.read()
        pred = np.asarray(Image.open(io.BytesIO(pred_png)))
        ref = np.asarray(make_serving_fn(model, mstate)(
            jnp.asarray(x[None])))[0]
        np.testing.assert_array_equal(pred, ref.astype(np.uint8))
    finally:
        server.shutdown()


@pytest.mark.slow
def test_export_roundtrip_full_denseunet(tmp_path):
    """Serving export generalizes beyond DeepLab: the full DenseUNet-161
    (dense-block concats, BN stats, dropout head — the ISIC arch) exports
    and reloads bit-exactly. ~2.5 min on CPU."""
    from cutmix_seg_tpu.models.denseunet import densenet161unet_imagenet

    model = densenet161unet_imagenet(num_classes=2, pretrained=False)
    mstate = _state(model)
    path = str(tmp_path / "dense.jaxexport")
    export_serving_artifact(model, mstate, (64, 64), path, num_classes=2,
                            platforms=("cpu",))
    call, meta = load_serving_artifact(path)
    assert meta["num_classes"] == 2
    x = np.random.RandomState(0).randint(
        0, 256, size=(2, 64, 64, 3)).astype(np.uint8)
    got = np.asarray(call(x))
    ref = np.asarray(make_serving_fn(model, mstate)(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)
