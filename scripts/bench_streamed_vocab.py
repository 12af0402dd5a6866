"""Pallas streamed-W_out rollout in its DESIGN regime (VERDICT r2 #5).

`ops/pallas_decoder.py` claims the kernel is "the winning design when the
vocab projection cannot stay resident" — never measured. This benches greedy
decode at a vocab too large for VMEM residency (V=65,536: W_out 64MB bf16 +
embedding 64MB + logits buffer) against the XLA scan, same dims otherwise
(msrvtt preset: T=26, D=1536, E=H=A=512, L=30).

Harness: python-unrolled chained decodes inside ONE jit (lax.map over a
pallas_call does not compile in this environment — ARCHITECTURE.md), distinct
inputs per iteration, results fetched with np.asarray.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_streamed_vocab.py [B] [iters]
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


def main(B=64, iters=8):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.decoding import greedy_decode
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params
    from vidcap_tpu.ops.pallas_decoder import from_params, pallas_rollout

    V = 65_536
    cfg = get_preset("msrvtt_attn_beam5")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, vocab_size=V))
    model = create_model(cfg, vocab_size=V)
    params = init_params(model, cfg, jax.random.key(0))
    T, D = cfg.data.num_frames, cfg.data.feature_dim
    L = cfg.decode.max_len
    rng = np.random.default_rng(0)
    stacked = jnp.asarray(rng.normal(size=(iters, B, T, D)), jnp.float32)

    def xla_decode(p, f):
        state = model.apply({"params": p}, f, method=VidCapModel.init_state)

        def step(st, tok):
            return model.apply({"params": p}, st, tok, True,
                               method=VidCapModel.step)
        return greedy_decode(step, state, B, L, early_exit=False,
                             with_logp=False).tokens

    weights = from_params(params)

    def pallas_decode(p, f):
        state = model.apply({"params": p}, f, method=VidCapModel.init_state)
        toks, _, _ = pallas_rollout(
            weights, state.keys, state.values, state.frame_mask,
            state.h[0], state.c[0], max_len=L, vocab_size=V,
            resident_wout=False)
        # keep the fusion pass away from the custom-call root: stacking the
        # kernel outputs directly crashes XLA (Check failed:
        # fused_root->IsFusible()) — same bug family as lax.map-over-pallas
        return jax.lax.optimization_barrier(toks)

    results = {}
    for name, decode in (("xla_scan", xla_decode),
                         ("pallas_streamed", pallas_decode)):
        @jax.jit
        def decode_many(p, fs, _decode=decode):
            outs = []
            for i in range(iters):        # python-unrolled: no lax.map
                outs.append(_decode(p, fs[i]))
            return jnp.stack(outs)

        out = np.asarray(decode_many(params, stacked))   # compile + warm
        t0 = time.perf_counter()
        out = np.asarray(decode_many(params, stacked))
        dt = time.perf_counter() - t0
        results[name] = {"caps_per_sec": round(B * iters / dt, 1),
                         "ms_per_decode": round(dt / iters * 1e3, 2)}
        print(f"{name}: {results[name]}", flush=True)

    # token parity sanity on the first batch
    a = np.asarray(jax.jit(xla_decode)(params, stacked[0]))
    b = np.asarray(jax.jit(pallas_decode)(params, stacked[0]))
    rows_equal = int((a == b).all(axis=1).sum())
    results["token_parity_rows"] = f"{rows_equal}/{B}"
    results["dims"] = {"B": B, "V": V, "T": T, "L": L, "iters": iters}
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
