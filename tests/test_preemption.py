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
    # wait for the first epoch line (ensures >= 1 resume checkpoint exists)
    deadline = time.time() + 420
    while time.time() < deadline:
        if os.path.exists(log_path) and "Epoch 1:" in open(log_path).read():
            break
        if proc.poll() is not None:
            out = proc.communicate()[0]
            raise AssertionError(f"child exited early:\n{out[-3000:]}")
        time.sleep(1)
    else:
        proc.kill()
        raise AssertionError("child never reached epoch 1")

    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=240)
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
