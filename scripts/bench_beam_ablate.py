"""Ablate the beam step's components with full-decode in-jit A/Bs (the only
timing methodology that holds on this backend — see CLAUDE.md). Each variant
keeps the scan/gather scaffolding identical and knocks out ONE stage:

  full    — the headline configuration (iterative top-k, bf16 logits)
  notopk  — top-k replaced by slicing the first K columns (projection + lse kept)
  nolse   — logsumexp skipped (top-k kept)
  noproj  — output projection reduced to K columns (kills the [·,V] matmul,
            the [B·K, V] logits buffer, its lse and its top-k sweeps)
  nogather— beam state rows never reordered (kills the h/c gather)

Results are WRONG captions for everything but `full` — this measures time only.
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


def run(variant: str, B: int = 208, iters: int = 8):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.data.vocab import BOS, EOS, PAD
    from vidcap_tpu.models.decoding import per_row_topk_iterative, tile_recurrent
    from vidcap_tpu.models.decoder import DecoderState
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params

    cfg = get_preset("msrvtt_attn_beam5")
    model = create_model(cfg, vocab_size=16_000)
    params = init_params(model, cfg, jax.random.key(0))
    T, D = cfg.data.num_frames, cfg.data.feature_dim
    K = 5
    V = 16_128
    max_len = 30
    rng = np.random.default_rng(0)

    def decode(p, f):
        state = tile_recurrent(model.apply({"params": p}, f,
                                           method=VidCapModel.init_state), K)

        def step_full(st, tok):
            return model.apply({"params": p}, st, tok, K, True,
                               method=VidCapModel.step_beam)

        def step_noproj(st, tok):
            st, h = model.apply({"params": p}, st, tok, K,
                                method=VidCapModel.step_beam_hidden)
            w = p["decoder"]["out_proj"]["kernel"][:, :K].astype(h.dtype)
            return st, h @ w                       # [B*K, K] mini-logits

        NEG = -1e30

        def step(carry, t):
            st, prev_tok, alive_logp, alive_seq, finished = carry
            st, logits = (step_noproj if variant == "noproj"
                          else step_full)(st, prev_tok)
            if variant == "nolse":
                lse = jnp.zeros(logits.shape[0], jnp.float32)
            else:
                lse = jax.scipy.special.logsumexp(
                    logits.astype(jnp.float32), axis=-1)
            if variant == "notopk" or variant == "noproj":
                tv = logits[:, :K]
                ti = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None],
                                      tv.shape)
            else:
                tv, ti = per_row_topk_iterative(logits, K)
            logp_k = (tv.astype(jnp.float32) - lse[:, None]).reshape(B, K, K)
            idx_k = ti.reshape(B, K, K).astype(jnp.int32)

            fin = finished[:, :, None]
            first_slot = (jnp.arange(K) == 0)[None, None, :]
            logp_k = jnp.where(fin, jnp.where(first_slot, 0.0, NEG), logp_k)
            idx_k = jnp.where(fin, PAD, idx_k)
            cand = alive_logp[:, :, None] + logp_k
            beam_mask = jnp.where(
                (t == 0) & (jnp.arange(K)[None, :, None] > 0), NEG, 0.0)
            cand = cand + beam_mask
            flat = cand.reshape(B, K * K)
            top_logp, top_idx = jax.lax.top_k(flat, K)
            src_beam = top_idx // K
            src_pos = top_idx % K
            bidx = jnp.arange(B)[:, None]
            new_tok = idx_k[bidx, src_beam, src_pos]
            new_seq = alive_seq[bidx, src_beam]
            new_seq = new_seq.at[:, :, t].set(new_tok)
            new_finished = finished[bidx, src_beam] | (new_tok == EOS)
            if variant != "nogather":
                flat_src = (bidx * K + src_beam).reshape(B * K)
                st = DecoderState(h=st.h[:, flat_src], c=st.c[:, flat_src],
                                  keys=st.keys, values=st.values,
                                  frame_mask=st.frame_mask)
            return (st, new_tok.reshape(B * K), top_logp, new_seq,
                    new_finished), None

        alive_seq = jnp.zeros((B, K, max_len), jnp.int32)
        carry = (state, jnp.full((B * K,), BOS, jnp.int32),
                 jnp.zeros((B, K), jnp.float32), alive_seq,
                 jnp.zeros((B, K), bool))
        (st, _, alive_logp, alive_seq, _), _ = jax.lax.scan(
            step, carry, jnp.arange(max_len))
        best = jnp.argmax(alive_logp, axis=-1)
        return alive_seq[jnp.arange(B), best]

    stacked = jnp.asarray(rng.normal(size=(iters, B, T, D)), jnp.float32)

    @jax.jit
    def many(p, fs):
        return jax.lax.map(lambda f: decode(p, f), fs)

    np.asarray(many(params, stacked))
    t0 = time.perf_counter()
    r = np.asarray(many(params, stacked))
    dt = time.perf_counter() - t0
    print(f"{variant}: {B * iters / dt:.0f} caps/s "
          f"({dt / iters * 1e3:.1f} ms/batch, "
          f"{dt / iters / max_len * 1e3:.3f} ms/step)", flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "full",
        B=int(sys.argv[2]) if len(sys.argv) > 2 else 208)
