"""MULTI-HOST training (SURVEY.md §2.3 "Comm backend" / multi-host row):
two real OS processes, each owning 4 CPU devices, joined by
jax.distributed.initialize into ONE 8-device global mesh — the package's own
place_state / shard_batch / make_sharded_step run UNCHANGED across the
process boundary (cross-process grad psum rides Gloo here, ICI/DCN on TPU),
and the loss matches the single-process 8-device run bit-for-bit.

This upgrades the multi-host story from "untestable on a 1-host bench" to a
frozen parity check; the TPU-pod path differs only in jax.distributed's
transport."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _run(pid: int, n: int, port: int, devices: int):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_WORKER))
    return subprocess.Popen(
        [sys.executable, _WORKER, str(pid), str(n), str(port), str(devices)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _loss(out: str) -> str:
    for line in out.splitlines():
        if line.startswith("RESULT"):
            assert "devices=8" in line, line
            return line.rsplit("loss=", 1)[1]
    raise AssertionError(f"no RESULT line in: {out!r}")


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    workers = [_run(pid, 2, port, devices=4) for pid in (0, 1)]
    outs = []
    for w in workers:
        out, err = w.communicate(timeout=300)
        assert w.returncode == 0, err[-2000:]
        outs.append(_loss(out))
    assert outs[0] == outs[1], outs   # both processes see the global loss

    base = _run(0, 1, 0, devices=8)
    out, err = base.communicate(timeout=300)
    assert base.returncode == 0, err[-2000:]
    assert _loss(out) == outs[0], (outs, _loss(out))
