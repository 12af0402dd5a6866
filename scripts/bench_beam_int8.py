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


def _find_out_proj(params):
    """Locate the decoder's out_proj Dense leaves in the param tree."""
    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from walk(v, path + (k,))
        else:
            yield path, tree
    kernel = bias = None
    for path, leaf in walk(params):
        if "out_proj" in path:
            if path[-1] == "kernel":
                kernel = leaf
            elif path[-1] == "bias":
                bias = leaf
    assert kernel is not None, "out_proj kernel not found"
    return kernel, bias


def quantize_wout(kernel, bias, vocab_size):
    """Symmetric per-output-channel int8: W8[h,v] * wscale[v] ≈ W[h,v].
    The padded-vocab -1e30 mask folds into the bias (same trick the
    skip_vocab_mask path uses — decoder.py:217-224)."""
    W = np.asarray(kernel, np.float32)                       # [H, Vp]
    wscale = np.maximum(np.abs(W).max(axis=0), 1e-8) / 127.0  # [Vp]
    W8 = np.clip(np.round(W / wscale), -127, 127).astype(np.int8)
    Vp = W.shape[1]
    b = (np.zeros((Vp,), np.float32) if bias is None
         else np.asarray(bias, np.float32).copy())
    b[vocab_size:] = -1e30
    return jnp.asarray(W8), jnp.asarray(wscale[None, :]), jnp.asarray(b)


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

    W8, wscale, bq = quantize_wout(*_find_out_proj(params), model.vocab_size)

    def make_step(p):
        def base(state, tok):
            return model.apply({"params": p}, state, tok, K, True,
                               method=VidCapModel.step_beam)

        def hidden(state, tok):
            return model.apply({"params": p}, state, tok, K,
                               method=VidCapModel.step_beam_hidden)

        def w8a8(state, tok):
            state2, h = hidden(state, tok)
            h = h.astype(jnp.float32)
            hscale = jnp.max(jnp.abs(h), -1, keepdims=True) / 127.0  # [BK,1]
            h8 = jnp.clip(jnp.round(h / jnp.maximum(hscale, 1e-8)),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(                   # int8×int8 → i32 MXU
                h8, W8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            logits = (acc.astype(jnp.float32) * (hscale * wscale)
                      + bq).astype(jnp.bfloat16)
            return state2, logits

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
    np.save(f"/tmp/int8_toks_{variant}.npy", toks)
    base_path = "/tmp/int8_toks_base.npy"
    if variant != "base" and _os.path.exists(base_path):
        ref = np.load(base_path)
        row_mismatch = (toks != ref).any(-1).mean()
        out["caption_mismatch_vs_base"] = round(float(row_mismatch), 4)
    print(__import__("json").dumps(out), flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "w8a8",
        B=int(sys.argv[2]) if len(sys.argv) > 2 else 128)
