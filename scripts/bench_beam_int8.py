"""In-situ A/B: int8-quantized vocab projection in the beam step (VERDICT r4
next #7 — the one decode memory-traffic lever not yet in ARCHITECTURE.md's
measured rule-out list).

Variants (same full-decode lax.map harness as scripts/bench_beam_ab.py — the
only measurement methodology that has held up in bench.py, per CLAUDE.md):

  base   — the production step_beam path (bf16 matmul, bf16 logits buffer)
  w8a8   — symmetric per-output-channel int8 W_out × per-row dynamic int8
           activations: one int8×int8 MXU matmul (i32 accum), rescale to f32,
           bias with the -1e30 vocab mask pre-folded
  w8bf16 — int8 W_out dequantized to bf16 at use (tests whether XLA hoists the
           dequant out of the scan — if it does, traffic is unchanged and this
           arm ties base)

Besides caps/s, reports token parity vs base: int8 is only adoptable if beams
stay token-identical or the deviation is quantified (it is expected NOT to be
identical — rounding W changes logits by ~1e-2, far above bf16's top-k
tie-break margins; the interesting number is the mismatch rate).

Usage: python scripts/bench_beam_int8.py [variant] [B]
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


from vidcap_tpu.ops.int8_proj import int8_logits, quantize_out_proj


def run(variant="w8a8", B=128, iters=8):
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

    W8, wscale, bq = quantize_out_proj(params, model.vocab_size)

    def make_step(p):
        def base(state, tok):
            return model.apply({"params": p}, state, tok, K, True,
                               method=VidCapModel.step_beam)

        def hidden(state, tok):
            return model.apply({"params": p}, state, tok, K,
                               method=VidCapModel.step_beam_hidden)

        def w8a8(state, tok):
            state2, h = hidden(state, tok)
            return state2, int8_logits(h, W8, wscale, bq)

        def w8bf16(state, tok):
            state2, h = hidden(state, tok)
            Wdq = (W8.astype(jnp.bfloat16)
                   * wscale.astype(jnp.bfloat16))        # dequant at use
            logits = (h.astype(jnp.bfloat16) @ Wdq
                      + bq.astype(jnp.bfloat16))
            return state2, logits

        return {"base": base, "w8a8": w8a8, "w8bf16": w8bf16}[variant]

    def decode(p, f):
        st = tile_recurrent(model.apply({"params": p}, f,
                                        method=VidCapModel.init_state), K)
        return beam_decode(make_step(p), st, batch=B, max_len=30,
                           beam_width=K)[0]

    stacked = jnp.asarray(rng.normal(size=(iters, B, T, D)), jnp.float32)

    @jax.jit
    def many(p, fs):
        return jax.lax.map(lambda f: decode(p, f), fs)

    toks = np.asarray(many(params, stacked))           # compile + result
    t0 = time.perf_counter()
    toks = np.asarray(many(params, stacked))
    dt = time.perf_counter() - t0
    out = {"variant": variant, "caps_per_s": round(B * iters / dt),
           "ms_per_batch": round(dt / iters * 1e3, 1)}
    np.save(f"/tmp/int8_toks_{variant}_b{B}.npy", toks)
    base_path = f"/tmp/int8_toks_base_b{B}.npy"
    if variant != "base" and _os.path.exists(base_path):
        ref = np.load(base_path)
        assert ref.shape == toks.shape, (
            f"stale base tokens {ref.shape} vs {toks.shape} — "
            "re-run the base variant at this B first")
        row_mismatch = (toks != ref).any(-1).mean()
        out["caption_mismatch_vs_base"] = round(float(row_mismatch), 4)
    print(__import__("json").dumps(out), flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "w8a8",
        B=int(sys.argv[2]) if len(sys.argv) > 2 else 128)
