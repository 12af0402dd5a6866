"""A/B the beam headline with topk_impl variants (same method as bench.py)."""
import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import sys, time
import jax, jax.numpy as jnp, numpy as np


def run(impl, B=128, iters=8):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.decoding import beam_decode, tile_recurrent
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params

    cfg = get_preset("msrvtt_attn_beam5")
    model = create_model(cfg, vocab_size=16_000)
    params = init_params(model, cfg, jax.random.key(0))
    T, D = cfg.data.num_frames, cfg.data.feature_dim
    rng = np.random.default_rng(0)
    K = 5

    bf16_logits = "-bf16" in impl
    topk = impl.replace("-bf16", "")
    unroll = 1
    if "-u" in topk:
        topk, u = topk.rsplit("-u", 1)
        unroll = int(u)

    def decode(p, f):
        st = tile_recurrent(model.apply({"params": p}, f,
                                        method=VidCapModel.init_state), K)

        def sb(s, tok):
            return model.apply({"params": p}, s, tok, K, bf16_logits,
                               method=VidCapModel.step_beam)

        return beam_decode(sb, st, batch=B, max_len=30, beam_width=K, topk_impl=topk,
                           unroll=unroll)[0]

    stacked = jnp.asarray(rng.normal(size=(iters, B, T, D)), jnp.float32)

    @jax.jit
    def many(p, fs):
        return jax.lax.map(lambda f: decode(p, f), fs)

    r0 = np.asarray(many(params, stacked))
    t0 = time.perf_counter()
    r = np.asarray(many(params, stacked))
    dt = time.perf_counter() - t0
    print(f"{impl}: {B*iters/dt:.0f} caps/s ({dt/iters*1e3:.1f} ms/batch)  "
          f"first={r[0][0][:6]}", flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "lax",
        B=int(sys.argv[2]) if len(sys.argv) > 2 else 128)
