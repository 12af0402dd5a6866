"""End-to-end train step at the PRESET shapes on the real chip (VERDICT r2 #9).

configs[2] (`e2e_irv2`): pixels [B=8, T=26, 299, 299, 3] -> IRv2 (remat) ->
attention decoder -> XE -> grads into the CNN, one jitted step. Round 2 only
recorded B=2, T=8; this measures the preset's own shapes (loudly reporting the
HBM-estimate guard first) and steps/sec.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_e2e_preset.py [B] [T] [iters]
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def hbm_estimate_bytes(B, T, S):
    """Loud pre-flight estimate (like pallas_rollout's VMEM guard): dominant
    live buffers of the remat'd e2e step, NOT an exact accounting.
    Per frame the IRv2 stem's biggest activations are ~35x35x320 f32 plus the
    block inputs saved at remat boundaries (~40 block inputs of up to
    35x35x320 -> 17x17x1088 -> 8x8x2080)."""
    frames = B * T
    stem = 147 * 147 * 32 + 73 * 73 * 80 + 35 * 35 * 320
    saved = (10 * 35 * 35 * 320 + 20 * 17 * 17 * 1088 + 10 * 8 * 8 * 2080)
    params = 54.4e6 * (4 + 8)          # f32 master + adam moments
    acts = frames * (stem + saved) * 4  # f32 saved activations
    inputs = frames * S * S * 3 * 4
    return params + acts + inputs


def main(B=8, T=26, iters=10, remat_every=1):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.models.model import create_model, init_params
    from vidcap_tpu.train.loop import batch_to_device_dict
    from vidcap_tpu.train.state import create_train_state
    from vidcap_tpu.train.steps import make_xe_step

    cfg = get_preset("e2e_irv2")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, dataset="synthetic", num_frames=T),
        model=dataclasses.replace(cfg.model,
                                  backbone_remat_every=remat_every),
        train=dataclasses.replace(cfg.train, batch_size=B,
                                  donate_state=True))
    S = cfg.data.frame_size
    est = hbm_estimate_bytes(B, T, S)
    print(f"[e2e] preset shapes B={B} T={T} {S}x{S}: HBM estimate "
          f"{est/1e9:.1f} GB (v5e has 16 GB)", flush=True)

    # synthetic corpus supplies captions/vocab; PIXEL batches are random
    ds = CaptionDataset.synthetic(
        dataclasses.replace(cfg.data, feature_dim=8, num_frames=T),
        num_videos=32)
    model = create_model(cfg, vocab_size=ds.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f"[e2e] params: {n_params/1e6:.1f}M", flush=True)
    state = create_train_state(cfg, params)
    step = make_xe_step(model, cfg)

    rng = np.random.default_rng(0)
    it = ds.batches(B, seed=0)

    def pixel_batch():
        b = batch_to_device_dict(next(it))
        b["features"] = jnp.asarray(
            rng.normal(size=(B, T, S, S, 3)), jnp.float32)
        return jax.device_put(b)

    warm = pixel_batch()
    state, m = step(state, warm)
    jax.block_until_ready(m["loss"])
    print(f"[e2e] compiled; first loss {float(m['loss']):.3f}", flush=True)

    # stage only a few batches (one pixel batch is ~834MB at preset shapes —
    # staging `iters` of them OOMs the chip before the step does) and cycle;
    # the train state changes every step so dispatches are never identical
    n_staged = min(4, iters)
    batches = [pixel_batch() for _ in range(n_staged)]
    jax.block_until_ready(batches)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batches[i % n_staged])
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    out = {"metric": "e2e_train_steps_per_sec_preset", "B": B, "T": T,
           "remat_every": remat_every,
           "steps_per_sec": round(iters / dt, 3),
           "ms_per_step": round(dt / iters * 1e3, 1),
           "ms_per_frame_fwd_bwd": round(dt / iters * 1e3 / (B * T), 2),
           "hbm_estimate_gb": round(est / 1e9, 1),
           "loss_finite": bool(np.isfinite(float(m["loss"])))}
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         int(sys.argv[2]) if len(sys.argv) > 2 else 26,
         int(sys.argv[3]) if len(sys.argv) > 3 else 10,
         int(sys.argv[4]) if len(sys.argv) > 4 else 1)
