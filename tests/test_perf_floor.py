"""Perf-regression floor (SURVEY.md §4.5): the headline benchmark must clear
the BASELINE.json target on real TPU hardware; skipped wherever no TPU is
reachable (the CI suite itself runs on the CPU backend)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON = "/root/.axon_site"


def _tpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{AXON}:{REPO}"     # axon sitecustomize first → TPU
    return env


@pytest.mark.slow
def test_headline_beats_floor_on_tpu():
    if not os.path.isdir(AXON):
        pytest.skip("no axon TPU environment on this machine")
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0].platform)"],
        env=_tpu_env(), capture_output=True, text=True, timeout=300)
    if probe.returncode != 0 or probe.stdout.strip() != "tpu":
        pytest.skip(f"TPU backend unavailable: {probe.stdout!r}")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=_tpu_env(), cwd=REPO, capture_output=True, text=True,
        timeout=1200)
    assert r.returncode == 0, r.stderr[-800:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["metric"] == "captions_per_sec_per_chip_beam5"
    # BASELINE.json target ≥ 2,000; current headline ~10.5k — a floor of
    # 2,000 catches catastrophic regressions without flaking on the shared
    # chip's run-to-run variance
    assert result["value"] >= 2000, result
