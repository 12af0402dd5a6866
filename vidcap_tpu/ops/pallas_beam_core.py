"""Fused Pallas BEAM-STEP recurrent core (VERDICT r2 #4).

The round-2 beam profile (ARCHITECTURE.md "where the beam step's time goes")
attributes ~55% of the beam decode step to the recurrent core — shared-keys
attention + fused-gate LSTM — a chain of ~15 small XLA ops bounded by per-op
latency (0.36 ms measured vs ~0.05 ms of theoretical matmul time). This kernel
fuses that chain into ONE `pallas_call` per decode step:

    q-projection -> per-beam Bahdanau attention over the per-VIDEO keys
    (K beams share one VMEM read of keys/values) -> fused-gate LSTM matmul
    -> new (h, c)

The embedding gather stays in XLA (one fused op; gathering 1040 rows row-by-row
in-kernel would unroll 1040 DMAs) and so do the vocab projection + top-k
(ARCHITECTURE.md: the bf16 logits buffer is effectively VMEM-resident and the
iterative top-k is already optimal there).

Compiles inside `lax.scan` (ops/pallas_topk.py proved pallas-in-scan works
here; only `lax.map` OVER a pallas_call is broken in this environment — the
round-2 "ruled out" conflated the two, re-opened per VERDICT r2 #4).

Precision chain mirrors models/decoder.TemporalAttention.beam + LSTMCell
exactly (bf16 Dense outputs, bf16 add+tanh, f32 softmax/state) so beams match
the XLA path. Parity: tests/test_pallas_beam_core.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG = -1e30


def _beam_core_kernel(
    emb_ref,       # f32[B*K, E]   token embeddings (XLA gather, outside)
    h_ref,         # f32[B*K, H]
    c_ref,         # f32[B*K, H]
    keys_ref,      # bf16[B, T, A] per-video attention keys
    values_ref,    # bf16[B, T, H] per-video attention values
    fmask_ref,     # f32[B, T]
    wq_ref,        # bf16[H, A]
    u_ref,         # f32[1, A]
    wg_ref,        # bf16[E+2H, 4H]
    bg_ref,        # f32[1, 4H]
    h_out,         # f32[B*K, H]
    c_out,         # f32[B*K, H]
    *,
    B: int, K: int, E: int, H: int, A: int, T: int,
):
    h = h_ref[:]                                             # f32[BK, H]
    # ---- attention q-projection (mirrors Dense(dtype=bf16): bf16 rounded out)
    q_all = jnp.dot(h.astype(jnp.bfloat16), wq_ref[:],
                    preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)                   # [BK, A]
    u_bf = u_ref[:].astype(jnp.bfloat16)                     # [1, A]

    # ---- per-beam-slot attention: beam k of every video in one [B, T, A] pass
    # (K python iterations — small unroll; the K beams of a video share ONE
    # VMEM-resident keys/values block, the shared-keys layout of step_beam)
    ctx_slots = []
    for k in range(K):
        q_k = q_all.reshape(B, K, A)[:, k, :]                # bf16[B, A]
        s = jnp.tanh(keys_ref[:] + q_k[:, None, :])          # bf16[B, T, A]
        scores = jax.lax.dot_general(
            s, u_bf,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :, 0]                                           # f32[B, T]
        scores = jnp.where(fmask_ref[:] > 0, scores, NEG)
        attn = jax.nn.softmax(scores, axis=-1)               # f32[B, T]
        ctx_k = jax.lax.dot_general(
            attn[:, None, :].astype(jnp.bfloat16),           # [B, 1, T]
            values_ref[:],                                   # [B, T, H]
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]                                           # f32[B, H]
        ctx_slots.append(ctx_k[:, None, :])                  # [B, 1, H]
    ctx = jnp.concatenate(ctx_slots, axis=1).reshape(B * K, H)  # f32[BK, H]

    # ---- fused-gate LSTM: [emb; ctx; h] @ W on the MXU
    xh = jnp.concatenate([emb_ref[:], ctx, h], axis=-1
                         ).astype(jnp.bfloat16)              # [BK, E+2H]
    gates = jnp.dot(xh, wg_ref[:],
                    preferred_element_type=jnp.float32) + bg_ref[:]
    i_g = gates[:, 0 * H:1 * H]
    f_g = gates[:, 1 * H:2 * H]
    g_g = gates[:, 2 * H:3 * H]
    o_g = gates[:, 3 * H:4 * H]
    c_new = (jax.nn.sigmoid(f_g + 1.0) * c_ref[:]
             + jax.nn.sigmoid(i_g) * jnp.tanh(g_g))
    h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c_new)
    h_out[:] = h_new
    c_out[:] = c_new


def beam_core(emb: Array, h: Array, c: Array, keys: Array, values: Array,
              frame_mask: Array, wq: Array, u: Array, wg: Array, bg: Array,
              beam_width: int, interpret: bool = False
              ) -> Tuple[Array, Array]:
    """One fused beam recurrent-core step. emb/h/c have B·K rows (video-major:
    row b*K+k is video b's beam k); keys/values/frame_mask have B rows.
    Returns (h', c') f32[B·K, H]."""
    BK, E = emb.shape
    H = h.shape[-1]
    B, T, A = keys.shape
    K = beam_width
    assert BK == B * K, (BK, B, K)
    if jax.default_backend() == "cpu":
        interpret = True

    kern = functools.partial(_beam_core_kernel, B=B, K=K, E=E, H=H, A=A, T=T)
    h2, c2 = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((BK, H), jnp.float32),
                   jax.ShapeDtypeStruct((BK, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        emb.astype(jnp.float32), h.astype(jnp.float32), c.astype(jnp.float32),
        keys.astype(jnp.bfloat16), values.astype(jnp.bfloat16),
        frame_mask.astype(jnp.float32),
        wq.astype(jnp.bfloat16), u.reshape(1, -1).astype(jnp.float32),
        wg.astype(jnp.bfloat16), bg.reshape(1, -1).astype(jnp.float32),
    )
    return h2, c2


def make_fused_beam_step(model, params, beam_width: int,
                         keep_compute_dtype: bool = True,
                         interpret: bool = False):
    """Drop-in replacement for ``model.step_beam`` built on the fused kernel:
    ``step(state, tok) -> (state', logits)``. XLA keeps the embedding gather
    and the vocab projection + padding mask; the kernel fuses everything in
    between. 1-layer attention decoders only (the reference config) —
    enforced loudly: a multi-layer decoder would otherwise run with layer-0
    weights only and silently produce wrong beams (review r3).

    ``params`` may be concrete arrays OR jit tracers — pass it inside a jitted
    function to thread the weights as traced arguments (the A/B harness does
    this so both arms compile under the same regime)."""
    mcfg = model.cfg.model
    if mcfg.num_lstm_layers != 1 or not mcfg.use_attention:
        raise ValueError(
            "make_fused_beam_step supports only the 1-layer attention "
            f"decoder (got num_lstm_layers={mcfg.num_lstm_layers}, "
            f"use_attention={mcfg.use_attention})")
    dec = params["decoder"]
    emb_table = dec["embed"]["embedding"]
    wq = dec["attention"]["query"]["kernel"]
    u = dec["attention"]["u"]
    wg = dec["lstm0"]["w"]
    bg = dec["lstm0"]["b"]
    wo = dec["out_proj"]["kernel"].astype(jnp.bfloat16)
    bo = dec["out_proj"]["bias"].astype(jnp.bfloat16)
    padded_vocab = wo.shape[-1]
    vocab_size = model.vocab_size
    K = beam_width

    from vidcap_tpu.models.decoder import DecoderState

    def step(state: DecoderState, tok: Array):
        emb = jnp.take(emb_table, tok, axis=0).astype(jnp.float32)  # [BK, E]
        h2, c2 = beam_core(emb, state.h[0], state.c[0], state.keys,
                           state.values, state.frame_mask, wq, u, wg, bg,
                           beam_width=K, interpret=interpret)
        # vocab projection mirrors decoder._lstm_logits with
        # keep_compute_dtype: Dense(dtype=bf16) output + bf16 bias, then mask
        logits = (jnp.dot(h2.astype(jnp.bfloat16), wo,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16) + bo)
        if not keep_compute_dtype:
            logits = logits.astype(jnp.float32)
        logits = jnp.where(jnp.arange(padded_vocab) < vocab_size, logits,
                           jnp.asarray(NEG, logits.dtype))
        new_state = DecoderState(h=h2[None], c=c2[None], keys=state.keys,
                                 values=state.values,
                                 frame_mask=state.frame_mask)
        return new_state, logits

    return step
