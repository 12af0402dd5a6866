"""Worker for tests/test_multihost.py — run OUTSIDE pytest in its own
process: initializes jax.distributed (Gloo CPU collectives), builds the
package's sharded XE step over the GLOBAL 8-device mesh, runs 3 steps of the
deterministic batch stream, prints the final loss.

argv: process_id num_processes coordinator_port local_device_count
num_processes=1 (the baseline) skips jax.distributed — same script, same
math, one process owning all 8 devices."""
import os
import sys

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                           + sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
if n > 1:
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n, process_id=pid)

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from vidcap_tpu.config import get_preset  # noqa: E402
from vidcap_tpu.data.loader import CaptionDataset  # noqa: E402
from vidcap_tpu.models.model import create_model, init_params  # noqa: E402
from vidcap_tpu.parallel.mesh import make_mesh  # noqa: E402
from vidcap_tpu.parallel.sharding import (make_sharded_step,  # noqa: E402
                                          place_state, shard_batch)
from vidcap_tpu.train.state import create_train_state  # noqa: E402
from vidcap_tpu.train.steps import make_xe_step_body  # noqa: E402

cfg = get_preset("synthetic_tiny")
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, compute_dtype="float32"),
    train=dataclasses.replace(cfg.train, batch_size=16, donate_state=False))
ds = CaptionDataset.synthetic(cfg.data, num_videos=32, seed=0)
model = create_model(cfg, ds.vocab.size)
params = init_params(model, cfg, jax.random.key(0))
mesh = make_mesh(cfg.mesh, num_data=8, num_model=1)
with mesh:
    state = place_state(create_train_state(cfg, params), mesh)
    step = make_sharded_step(cfg, mesh, make_xe_step_body(model, cfg))
    it = ds.batches(16, seed=1)
    for _ in range(3):
        b = next(it)
        d = {k: np.asarray(v) for k, v in b.__dict__.items()}
        state, m = step(state, shard_batch(d, mesh))
print(f"RESULT p{pid} devices={jax.device_count()} "
      f"loss={float(m['loss']):.10f}", flush=True)
