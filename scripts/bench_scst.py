"""Focused SCST train-step throughput (same config as bench_all.bench_train).
PYTHONPATH=... python scripts/bench_scst.py [B] [iters] [fused|legacy]"""
import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import dataclasses
import sys
import time

import jax
import numpy as np


def main(B=64, iters=20, mode="fused"):
    assert mode in ("fused", "legacy"), f"mode must be fused|legacy, got {mode!r}"
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.models.model import create_model, init_params
    from vidcap_tpu.objectives.reward_tables import tables_from_dataset
    from vidcap_tpu.train.loop import batch_to_device_dict
    from vidcap_tpu.train.scst import make_scst_step
    from vidcap_tpu.train.state import create_train_state

    cfg = get_preset("msrvtt_attn_beam5")
    dcfg = dataclasses.replace(cfg.data, dataset="synthetic")
    ds = CaptionDataset.synthetic(dcfg, num_videos=256)
    model = create_model(cfg, vocab_size=ds.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))

    scfg = dataclasses.replace(
        cfg, data=dcfg,
        train=dataclasses.replace(cfg.train, stage="scst", batch_size=B,
                                  attribute_loss_weight=0.2, scst_xe_mix=0.1,
                                  scst_fused_rollouts=(mode == "fused"),
                                  donate_state=False))
    step = make_scst_step(model, scfg, tables=tables_from_dataset(ds))
    state = create_train_state(scfg, params)
    it = ds.batches(B, seed=0)
    batches = [jax.device_put(batch_to_device_dict(next(it)))
               for _ in range(iters + 2)]
    jax.block_until_ready(batches)
    for b in batches[:2]:
        state, m = step(state, b)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for b in batches[2:]:
        state, m = step(state, b)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    print(f"scst[{mode}] B={B}: {iters/dt:.1f} steps/s ({dt/iters*1e3:.1f} ms/step)  "
          f"reward_greedy={float(m['reward_greedy']):.3f} "
          f"adv_std={float(m['advantage_std']):.3f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         int(sys.argv[2]) if len(sys.argv) > 2 else 20,
         sys.argv[3] if len(sys.argv) > 3 else "fused")
