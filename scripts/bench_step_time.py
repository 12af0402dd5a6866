"""Per-decode-step time for the Pallas kernel vs the XLA rollout, with the
remote-dispatch constant cancelled: time(max_len=330) − time(max_len=30) over
300 steps. (lax.map over pallas_call trips an XLA fusion CHECK, so batching
rollouts inside one jit is not available for the kernel path.)"""
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


def main(B=64):
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
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)

    def step_fn(state, tok):
        return model.apply({"params": params}, state, tok,
                           method=VidCapModel.step)

    def measure(fn, reps=10):
        np.asarray(fn(params, feats))      # compile
        np.asarray(fn(params, feats))
        t0 = time.time()
        for _ in range(reps):
            r = fn(params, feats)
        np.asarray(r)
        return (time.time() - t0) / reps

    out = {}
    for name, builder in (
        ("pallas", lambda L: jax.jit(
            lambda p, f: model_rollout(model, p, f, max_len=L).tokens)),
        ("xla", lambda L: jax.jit(
            lambda p, f: greedy_decode(
                step_fn, model.apply({"params": p}, f,
                                     method=VidCapModel.init_state),
                B, L).tokens)),
    ):
        t30 = measure(builder(30))
        t330 = measure(builder(330))
        per_step = (t330 - t30) / 300
        out[name] = per_step
        print(f"{name}: t30={t30*1e3:.2f}ms t330={t330*1e3:.2f}ms "
              f"-> {per_step*1e6:.1f} us/step "
              f"-> {B/(per_step*30):.0f} caps/s at L=30 (chip-true)",
              flush=True)
    print(f"speedup pallas vs xla: {out['xla']/out['pallas']:.2f}x",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
