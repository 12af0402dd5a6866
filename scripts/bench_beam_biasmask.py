"""A/B: per-step vocab-padding `where` over the [B·K, V] logits vs folding the
mask into out_proj.bias ONCE before decode (bit-identical, see
decoder._lstm_logits). Full-decode in-jit, B=208 headline config."""
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


def run(fold: bool, B: int = 208, iters: int = 8):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.decoding import beam_decode, tile_recurrent
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params

    cfg = get_preset("msrvtt_attn_beam5")
    model = create_model(cfg, vocab_size=16_000)
    params = init_params(model, cfg, jax.random.key(0))
    T, D = cfg.data.num_frames, cfg.data.feature_dim
    K, V = 5, 16_000
    if fold:
        b = params["decoder"]["out_proj"]["bias"]
        params["decoder"]["out_proj"]["bias"] = b.at[V:].set(-1e30)

    def decode(p, f):
        st = tile_recurrent(model.apply({"params": p}, f,
                                        method=VidCapModel.init_state), K)

        def sb(s, tok):
            return model.apply({"params": p}, s, tok, K, True, fold,
                               method=VidCapModel.step_beam)

        return beam_decode(sb, st, batch=B, max_len=30, beam_width=K)[0]

    rng = np.random.default_rng(0)
    stacked = jnp.asarray(rng.normal(size=(iters, B, T, D)), jnp.float32)

    @jax.jit
    def many(p, fs):
        return jax.lax.map(lambda f: decode(p, f), fs)

    r = np.asarray(many(params, stacked))
    t0 = time.perf_counter()
    r = np.asarray(many(params, stacked))
    dt = time.perf_counter() - t0
    print(f"fold={fold}: {B*iters/dt:.0f} caps/s ({dt/iters*1e3:.1f} ms/batch) "
          f"first={r[0][0][:6]}", flush=True)


if __name__ == "__main__":
    run(sys.argv[1] == "fold" if len(sys.argv) > 1 else False)
