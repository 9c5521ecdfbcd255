"""Graceful-preemption test: SIGTERM mid-run stops the trainer at an
iteration boundary with a clean exit, and --resume from the last
epoch-boundary checkpoint continues the run (bit-exactly — the host streams
are epoch-seeded, engine._open_epoch_streams)."""

import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow  # subprocess trainer runs


def test_sigterm_preempts_and_resume_completes(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "_preempt_child.py")
    zip_path = str(tmp_path / "cityscapes_segmentation.zip")
    out_root = str(tmp_path / "results")
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
        "PYTHONUNBUFFERED": "1",
    })

    # a run long enough to be mid-flight when the signal lands
    proc = subprocess.Popen(
        [sys.executable, child, zip_path, out_root, "50", "run1"],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    log_path = os.path.join(out_root, "preempt_trainer", "run1",
                            "log_run1.txt")
    # wait for the first epoch line (ensures >= 1 resume checkpoint exists);
    # kill the child on EVERY failure path (it would train 50 epochs into a
    # full stdout pipe otherwise)
    try:
        deadline = time.time() + 420
        while time.time() < deadline:
            if (os.path.exists(log_path)
                    and "Epoch 1:" in open(log_path).read()):
                break
            if proc.poll() is not None:
                out = proc.communicate()[0]
                raise AssertionError(f"child exited early:\n{out[-3000:]}")
            time.sleep(1)
        else:
            raise AssertionError("child never reached epoch 1")

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=240)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-3000:]
    assert "PREEMPTED: stopped at epoch" in out
    assert "CHILD_EXIT_CLEAN" in out

    ckpt_dir = os.path.join(out_root, "preempt_trainer", "run1",
                            "checkpoints")
    assert os.listdir(ckpt_dir), "no resume checkpoint was left behind"

    # resume to a short horizon and finish normally
    proc2 = subprocess.run(
        [sys.executable, child, zip_path, out_root, "3", "run1", "resume"],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=420)
    assert proc2.returncode == 0, proc2.stdout[-3000:]
    assert "Resumed from" in proc2.stdout
    assert "CHILD_EXIT_CLEAN" in proc2.stdout


def test_sigterm_coordinated_stop_across_processes(tmp_path):
    """Multi-host preemption: SIGTERM delivered to ONE process of a
    2-process DCN run stops BOTH at the same completed epoch boundary (the
    per-epoch flag allgather), leaving a resume checkpoint — no host is
    wedged in a collective."""
    import socket

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        from test_trainer_e2e import build_tiny_zip
    finally:
        sys.path.pop(0)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "_preempt_child.py")
    zip_path = str(tmp_path / "cityscapes_segmentation.zip")
    build_tiny_zip(zip_path)  # pre-build: two children racing would corrupt
    out_root = str(tmp_path / "results")

    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
            "PYTHONUNBUFFERED": "1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, child, zip_path, out_root, "50",
             f"dcn{pid}"], env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))

    # wait until the LEAD process has logged epoch 1 (both are in lockstep
    # at the epoch allgather), then preempt only process 1. Any failure path
    # must kill BOTH children (an orphan keeps training for 50 epochs with
    # an undrained stdout pipe).
    log_path = os.path.join(out_root, "preempt_trainer", "dcn0",
                            "log_dcn0.txt")
    outs = []
    try:
        deadline = time.time() + 420
        while time.time() < deadline:
            if (os.path.exists(log_path)
                    and "Epoch 1:" in open(log_path).read()):
                break
            for p in procs:
                if p.poll() is not None:
                    outs = [pr.communicate()[0]
                            if pr.poll() is not None else ""
                            for pr in procs]
                    if any(b in o for o in outs
                           for b in ("Permission denied", "UNAVAILABLE",
                                     "failed to connect")):
                        pytest.skip("localhost coordinator blocked")
                    raise AssertionError(
                        "child exited early:\n" + outs[0][-2000:]
                        + "\n---\n" + outs[1][-2000:])
            time.sleep(1)
        else:
            raise AssertionError("children never reached epoch 1")

        procs[1].send_signal(signal.SIGTERM)
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    # BOTH processes took the coordinated stop
    for out in outs:
        assert "PREEMPTED: stopping after epoch" in out, out[-2000:]
        assert "CHILD_EXIT_CLEAN" in out
    # both stopped after the SAME epoch
    import re
    eps = [re.search(r"stopping after epoch (\d+)", o).group(1) for o in outs]
    assert eps[0] == eps[1], eps
    # the lead left a resume checkpoint
    assert os.listdir(os.path.join(out_root, "preempt_trainer", "dcn0",
                                   "checkpoints"))
