"""Two-process DCN smoke test: jax.distributed over a localhost coordinator.

Spawns two subprocesses that initialise through
``parallel.mesh.maybe_initialize_distributed`` (the same env-var-driven entry
the trainer CLIs call before touching devices), verifies the backend spans
both processes, and runs one cross-process all-reduce. Skips when the
environment forbids localhost sockets.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dcn_all_reduce():
    try:
        port = _free_port()
    except OSError as e:
        pytest.skip(f"localhost sockets unavailable: {e}")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "_dcn_child.py")
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, child], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("DCN smoke timed out (coordinator likely blocked)")

    blocked = ("Permission denied", "UNAVAILABLE", "failed to connect")
    for p, out in zip(procs, outs):
        if p.returncode != 0 and any(b in out for b in blocked):
            pytest.skip(f"localhost coordinator blocked:\n{out[-1500:]}")
        assert p.returncode == 0, out[-3000:]
        assert "DCN_OK" in out, out[-3000:]


@pytest.mark.slow
def test_two_process_dcn_full_train_step():
    """The FULL fused CutMix mean-teacher train step across a 2-process DCN
    boundary (4 virtual devices per process, one global 8-device 'data'
    mesh): per-process input slices assembled via shard_batch, gradients/
    EMA/metrics reduced by XLA collectives inside the one program. Both
    processes must report bit-identical replicated metrics, and those must
    match the identical program executed on a single-process 8-device mesh
    (this test process's own virtual mesh) to numerical tolerance."""
    import re

    try:
        port = _free_port()
    except OSError as e:
        pytest.skip(f"localhost sockets unavailable: {e}")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "_dcn_step_child.py")
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, child], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("DCN step test timed out (coordinator likely blocked)")

    blocked = ("Permission denied", "UNAVAILABLE", "failed to connect")
    lines = []
    for p, out in zip(procs, outs):
        if p.returncode != 0 and any(b in out for b in blocked):
            pytest.skip(f"localhost coordinator blocked:\n{out[-1500:]}")
        assert p.returncode == 0, out[-3000:]
        m = re.search(r"DCN_STEP_OK process=\d (.+)", out)
        assert m, out[-3000:]
        lines.append(m.group(1))

    # replicated outputs must agree across the process boundary exactly
    assert lines[0] == lines[1], lines

    # and match the single-process execution of the same program on this
    # test's own 8-virtual-device mesh
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tests import _dcn_step_common as common  # tests/ is a package
    # (tests/__init__.py guards against the reference checkout's
    # own tests/ package shadowing this directory)
    from cutmix_seg_tpu.parallel.mesh import make_mesh, shard_batch

    if jax.device_count() < common.GLOBAL_BATCH:
        pytest.skip("needs 8 virtual devices (conftest)")
    mesh = make_mesh(common.GLOBAL_BATCH)
    model, state, step = common.build_step_and_state(mesh)
    batch = shard_batch(
        mesh, {k: jnp.asarray(v) for k, v in common.global_batch().items()})
    _, metrics = common.run_two_steps(mesh, state, step, batch)
    got = dict(re.findall(r"(\w+)=([-\d.e+]+)", lines[0]))
    for k, v in metrics.items():
        v = np.asarray(v)
        if v.ndim == 0 and k in got:
            assert float(got[k]) == pytest.approx(float(v), rel=2e-4,
                                                  abs=1e-6), (k, got[k], v)
