"""Beam-variant benchmark on the real TPU. Usage:
PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_beam.py [shared|fused|tiled] [B]
"""
import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(variant: str = "shared", B: int = 128):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.decoding import (beam_decode, beam_decode_fused,
                                            tile_recurrent, tile_state)
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params

    cfg = get_preset("msrvtt_attn_beam5")
    model = create_model(cfg, vocab_size=16_000)
    params = init_params(model, cfg, jax.random.key(0))
    T, D = cfg.data.num_frames, cfg.data.feature_dim
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
             for _ in range(7)]
    K = 5

    if variant == "fused":
        out_w = params["decoder"]["out_proj"]["kernel"]
        out_b = params["decoder"]["out_proj"]["bias"]

        @jax.jit
        def decode(f):
            st = tile_recurrent(model.apply({"params": params}, f,
                                            method=VidCapModel.init_state), K)

            def sh(s, tok):
                return model.apply({"params": params}, s, tok, K,
                                   method=VidCapModel.step_beam_hidden)

            return beam_decode_fused(sh, out_w, out_b, st, batch=B,
                                     max_len=30, beam_width=K,
                                     vocab_size=16_000)[0]
    elif variant == "shared":
        @jax.jit
        def decode(f):
            st = tile_recurrent(model.apply({"params": params}, f,
                                            method=VidCapModel.init_state), K)

            def sb(s, tok):
                return model.apply({"params": params}, s, tok, K,
                                   method=VidCapModel.step_beam)

            return beam_decode(sb, st, batch=B, max_len=30, beam_width=K)[0]
    else:  # tiled (original)
        @jax.jit
        def decode(f):
            st = tile_state(model.apply({"params": params}, f,
                                        method=VidCapModel.init_state), K, B)

            def sf(s, tok):
                return model.apply({"params": params}, s, tok,
                                   method=VidCapModel.step)

            return beam_decode(sf, st, batch=B, max_len=30, beam_width=K)[0]

    t = time.time()
    r0 = np.asarray(decode(feats[0]))
    print(f"{variant} B={B} compile+run {time.time()-t:.1f}s", flush=True)
    np.asarray(decode(feats[1]))
    t = time.time()
    for f in feats[2:]:
        r = decode(f)
    np.asarray(r)
    dt = (time.time() - t) / 5
    print(f"{variant} B={B} per-batch {dt*1e3:.1f}ms -> {B/dt:.0f} caps/s",
          flush=True)
    print("first row:", r0[0][:8])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "shared",
         int(sys.argv[2]) if len(sys.argv) > 2 else 128)
