"""CLI-level staged training + sharded serving via subprocess on the CPU
backend (mirrors test_fault_sigkill's env trick): covers cmd_train's staged
loop with cross-stage restore, and cmd_serve --sharded building a real mesh."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(n_devices=8):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO            # drop the axon sitecustomize → CPU
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_devices}"
                        ).strip()
    env["VIDCAP_NO_COMPILE_CACHE"] = "1"
    return env


@pytest.mark.slow
def test_cli_staged_xe_scst(tmp_path):
    """`train --stages xe,scst`: stage 2 resumes from stage 1's checkpoint
    (cross-stage restore) and SCST metrics appear in the log."""
    r = subprocess.run(
        [sys.executable, "-m", "vidcap_tpu", "train",
         "--preset", "synthetic_tiny", "--steps", "4",
         "--stages", "xe,scst", "--log-file", "log.jsonl"],
        cwd=tmp_path, env=_env(), capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    rows = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    assert any("xe_loss" in row for row in rows)
    scst_rows = [row for row in rows if "reward_sample" in row]
    assert scst_rows, rows
    assert max(row["step"] for row in rows) == 8      # 4 xe + 4 scst
    assert np.isfinite(scst_rows[-1]["reward_sample"])


@pytest.mark.slow
def test_cli_train_sharded_matches_single_device(tmp_path):
    """`train --sharded` on 8 virtual CPU devices: multi-chip TRAINING through
    the public CLI (VERDICT r2 #2) — staged xe,scst with sharded checkpoints,
    XE loss parity with the single-device run at the same seed, and the
    cross-stage optimizer re-init firing on the sharded path."""
    def run(sub, extra):
        d = tmp_path / sub
        d.mkdir()
        r = subprocess.run(
            [sys.executable, "-m", "vidcap_tpu", "train",
             "--preset", "synthetic_tiny", "--steps", "4", "--batch-size", "8",
             "--stages", "xe,scst", "--log-file", "log.jsonl"] + extra,
            cwd=d, env=_env(), capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-1500:]
        return [json.loads(l) for l in open(d / "log.jsonl")], r.stderr

    rows_s, err_s = run("sharded", ["--sharded"])
    rows_1, _ = run("single", [])
    xe_s = [row for row in rows_s
            if "xe_loss" in row and "reward_sample" not in row]
    xe_1 = [row for row in rows_1
            if "xe_loss" in row and "reward_sample" not in row]
    assert xe_s and xe_1
    # same seed → same batch stream; bf16 + different contraction splits bound
    # agreement (a missing grad-mean would be 8x off)
    np.testing.assert_allclose(xe_s[0]["xe_loss"], xe_1[0]["xe_loss"],
                               rtol=0.05)
    scst_rows = [row for row in rows_s if "reward_sample" in row]
    assert scst_rows, rows_s
    assert np.isfinite(scst_rows[-1]["reward_sample"])
    assert "resuming across stages (xe → scst)" in err_s


@pytest.mark.slow
def test_cli_train_sharded_resume_parity(tmp_path):
    """Sharded training + interrupt + resume: a run checkpointed at step 3 and
    resumed to step 6 must land where the uninterrupted 6-step sharded run
    lands (deterministic batcher state + sharded checkpoint round-trip)."""
    def run(sub, steps, resume=False):
        d = tmp_path / sub
        d.mkdir(exist_ok=True)
        cmd = [sys.executable, "-m", "vidcap_tpu", "train",
               "--preset", "synthetic_tiny", "--steps", str(steps),
               "--batch-size", "8", "--sharded", "--log-file", "log.jsonl"]
        if resume:
            cmd.append("--resume")
        r = subprocess.run(cmd, cwd=d, env=_env(), capture_output=True,
                           text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-1500:]
        return [json.loads(l) for l in open(d / "log.jsonl")]

    rows_full = run("full", 6)
    run("interrupted", 3)
    rows_res = run("interrupted", 6, resume=True)

    last_full = [r for r in rows_full if r["step"] == 6 and "loss" in r][-1]
    last_res = [r for r in rows_res if r["step"] == 6 and "loss" in r][-1]
    # same seed, same deterministic batch stream, restored opt/rng state —
    # losses must agree to float tolerance
    np.testing.assert_allclose(last_res["loss"], last_full["loss"], rtol=1e-4)


@pytest.mark.slow
def test_cli_serve_sharded(tmp_path):
    """`serve --sharded` on 8 virtual CPU devices: mesh decode end-to-end
    through the real CLI."""
    T, D = 4, 32   # synthetic_tiny shapes — keep in sync with the preset
    from vidcap_tpu.config import get_preset
    cfg = get_preset("synthetic_tiny")
    T, D = cfg.data.num_frames, cfg.data.feature_dim
    rng = np.random.default_rng(0)
    lines = []
    for i in range(5):
        p = tmp_path / f"f{i}.npy"
        np.save(p, rng.normal(size=(T, D)).astype(np.float32))
        lines.append(str(p))
    # serve refuses to run off an untrained checkpoint dir (inference.py
    # empty-dir guard, review r4) — put a 2-step checkpoint in place first
    r = subprocess.run(
        [sys.executable, "-m", "vidcap_tpu", "train",
         "--preset", "synthetic_tiny", "--steps", "2", "--batch-size", "8"],
        cwd=tmp_path, env=_env(), capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    r = subprocess.run(
        [sys.executable, "-m", "vidcap_tpu", "serve",
         "--preset", "synthetic_tiny", "--batch", "8", "--sharded",
         "--method", "beam", "--beam", "3"],
        cwd=tmp_path, env=_env(), input="\n".join(lines) + "\n",
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    out_lines = [l for l in r.stdout.splitlines() if "\t" in l]
    assert len(out_lines) == 5, r.stdout
    assert "served 5 captions" in r.stderr


@pytest.mark.slow
def test_cli_train_sharded_feature_bank_parity(tmp_path):
    """`train --sharded --feature-bank`: the replicated-bank sharded step is
    reachable from the public CLI and reproduces the plain sharded run's
    losses exactly (same seed, same stream, chip-local gathers)."""
    def run(sub, extra):
        d = tmp_path / sub
        d.mkdir()
        r = subprocess.run(
            [sys.executable, "-m", "vidcap_tpu", "train",
             "--preset", "synthetic_tiny", "--steps", "4", "--batch-size", "8",
             "--stages", "xe,scst", "--log-file", "log.jsonl"] + extra,
            cwd=d, env=_env(), capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-1500:]
        return [json.loads(l) for l in open(d / "log.jsonl")], r.stderr

    rows_b, err_b = run("banked", ["--sharded", "--feature-bank"])
    rows_p, _ = run("plain", ["--sharded"])
    assert "device_feature_bank ignored" not in err_b
    key_rows = [[(row["step"], row.get("xe_loss"), row.get("reward_sample"))
                 for row in rows if "loss" in row] for rows in (rows_b, rows_p)]
    assert key_rows[0] == key_rows[1]
