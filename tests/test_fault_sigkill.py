"""True fault injection (SURVEY.md §5): SIGKILL a training subprocess mid-run,
resume from its checkpoints in a fresh process, and verify the final parameters
EXACTLY match an uninterrupted run. Runs the real CLI on the CPU backend
(PYTHONPATH without the axon sitecustomize → jax defaults to CPU)."""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO            # drop the axon sitecustomize → CPU
    env.pop("JAX_PLATFORMS", None)
    env["VIDCAP_NO_COMPILE_CACHE"] = "1"
    return env


def _run_train(cwd, steps, resume=False, wait=True):
    cmd = [sys.executable, "-m", "vidcap_tpu", "train",
           "--preset", "synthetic_tiny", "--steps", str(steps),
           "--log-file", "log.jsonl"]
    if resume:
        cmd.append("--resume")
    p = subprocess.Popen(cmd, cwd=cwd, env=_env(),
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    if wait:
        assert p.wait(timeout=420) == 0
    return p


def _params_checksum(cwd):
    """Decode the val set greedily — a pure function of the final params."""
    out = subprocess.run(
        [sys.executable, "-m", "vidcap_tpu", "caption",
         "--preset", "synthetic_tiny", "--method", "greedy",
         "--out", "caps.json"],
        cwd=cwd, env=_env(), capture_output=True, timeout=420)
    assert out.returncode == 0, out.stderr[-500:]
    with open(os.path.join(cwd, "caps.json")) as f:
        return json.load(f)


@pytest.mark.slow
def test_sigkill_resume_parity(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()

    # uninterrupted run to step 10 (checkpoint_every=10 in the preset)
    _run_train(str(a), 10)
    caps_a = _params_checksum(str(a))

    # interrupted run: SIGKILL while training, after the step-5... the preset
    # checkpoints at step 10 and at final — so run to 5 (final ckpt at 5),
    # then KILL a second 10-step run partway, then resume
    _run_train(str(b), 5)
    p = _run_train(str(b), 10, resume=True, wait=False)
    time.sleep(3.0)                 # somewhere inside startup/steps
    p.send_signal(signal.SIGKILL)
    p.wait()
    assert p.returncode != 0        # really died

    # fresh process resumes from whatever checkpoint survived and finishes
    _run_train(str(b), 10, resume=True)
    caps_b = _params_checksum(str(b))

    assert caps_a == caps_b
