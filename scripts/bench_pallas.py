"""Pallas-vs-XLA rollout benchmark on the real TPU (perf evidence for the fused
decode kernel; not part of the headline bench.py)."""
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


def main(use_cache: bool = True, B: int = 64):
    if use_cache:
        from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
        enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.decoding import greedy_decode
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params
    from vidcap_tpu.ops.pallas_decoder import model_rollout

    cfg = get_preset("msrvtt_attn_beam5")
    model = create_model(cfg, vocab_size=16_000)
    params = init_params(model, cfg, jax.random.key(0))
    T, D = cfg.data.num_frames, cfg.data.feature_dim
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
             for _ in range(6)]

    def step_fn(state, tok):
        return model.apply({"params": params}, state, tok,
                           method=VidCapModel.step)

    @jax.jit
    def xla_greedy(p, f):
        st = model.apply({"params": p}, f, method=VidCapModel.init_state)
        return greedy_decode(step_fn, st, B, 30).tokens

    @jax.jit
    def kern_greedy(p, f):
        return model_rollout(model, p, f, max_len=30).tokens

    N = 20
    stacked = jnp.stack(feats[:5] + feats[:5] + feats[:5] + feats[:5])

    def timed(name, fn):
        many = jax.jit(lambda p, fs: jax.lax.map(lambda f: fn(p, f), fs))
        t = time.time()
        np.asarray(many(params, stacked))
        print(f"{name} compile+run {time.time()-t:.1f}s", flush=True)
        t = time.time()
        r = np.asarray(many(params, stacked))
        dt = time.time() - t
        print(f"{name} {N} on-chip rollouts {dt:.4f}s -> "
              f"{B*N/dt:.1f} caps/s ({dt/N*1e3:.2f} ms/rollout)", flush=True)
        return r

    k1 = timed("pallas", kern_greedy)
    x1 = timed("xla", xla_greedy)
    print("token match rate", (x1 == k1).mean(), flush=True)
    print("xla   ", x1[1][1][:10])
    print("pallas", k1[1][1][:10])


if __name__ == "__main__":
    main(use_cache="--no-cache" not in sys.argv,
         B=int(sys.argv[sys.argv.index("-B") + 1]) if "-B" in sys.argv else 64)
