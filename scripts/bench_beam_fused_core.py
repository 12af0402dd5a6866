"""In-situ A/B: fused Pallas beam-core kernel vs the XLA beam step
(VERDICT r2 #4 — the valid harness: python-unrolled chained decodes inside one
jit; lax.map over a pallas_call does not compile here, so BOTH arms use the
same unrolled harness for a fair comparison).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_beam_fused_core.py [B] [iters]
"""
from __future__ import annotations

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


def main(B=208, iters=8):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.decoding import beam_decode, tile_recurrent
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params
    from vidcap_tpu.ops.pallas_beam_core import make_fused_beam_step

    cfg = get_preset("msrvtt_attn_beam5")
    vocab_size = 16_000
    model = create_model(cfg, vocab_size=vocab_size)
    params = init_params(model, cfg, jax.random.key(0))
    T, D = cfg.data.num_frames, cfg.data.feature_dim
    K, L = cfg.decode.beam_width, cfg.decode.max_len
    pv = ((vocab_size + 127) // 128) * 128
    rng = np.random.default_rng(0)
    stacked = jnp.asarray(rng.normal(size=(iters, B, T, D)), jnp.float32)

    def xla_step_maker(p):
        def step(st, tok):
            return model.apply({"params": p}, st, tok, K, True,
                               method=VidCapModel.step_beam)
        return step

    def fused_step_maker(p):
        # built INSIDE the jit from the traced params so both arms thread
        # weights identically (baking the fused arm's weights in as
        # compile-time constants made the arms incomparable — review r3)
        return make_fused_beam_step(model, p, K)

    def decode_with(step, p, f):
        state = model.apply({"params": p}, f, method=VidCapModel.init_state)
        state = tile_recurrent(state, K)
        toks, _ = beam_decode(step, state, batch=B, max_len=L, beam_width=K)
        return toks

    results = {}
    for name, step_maker in (("xla", xla_step_maker),
                             ("fused", fused_step_maker)):
        @jax.jit
        def decode_many(p, fs, _maker=step_maker):
            step = _maker(p)
            outs = []
            for i in range(iters):      # python-unrolled (no lax.map)
                outs.append(decode_with(step, p, fs[i]))
            return jnp.stack(outs)

        np.asarray(decode_many(params, stacked))     # compile + warm
        t0 = time.perf_counter()
        out = decode_many(params, stacked)
        np.asarray(out)
        dt = time.perf_counter() - t0
        results[name] = round(B * iters / dt, 1)
        print(f"{name}: {results[name]} caps/s", flush=True)

    results["speedup"] = round(results["fused"] / results["xla"], 4)
    results["dims"] = {"B": B, "K": K, "L": L, "V": pv, "iters": iters}
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 208,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
