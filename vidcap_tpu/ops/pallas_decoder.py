"""Fused Pallas rollout kernel (BASELINE.json north_star: "the temporal-attention
LSTM decoder becomes a fused Pallas scan kernel (recurrent matmuls + attention
softmax + embedding lookup in one step function)").

ONE ``pallas_call`` runs the ENTIRE greedy / multinomial rollout:

  grid = (max_len,)  — sequential on a TPU core, so VMEM scratch (h, c, token,
  finished flags) persists across steps with zero HBM round-trips for state.

Per step, entirely on-chip:
  1. embedding lookup — aligned 8-row blocks + one-hot select (resident mode:
     direct VMEM loads; streamed mode: all-in-flight DMAs overlapped with #2)
  2. temporal attention — scores = u·tanh(keys + h·Wq), masked softmax, context
  3. LSTM — fused-gate matmul [emb; ctx; h] @ W on the MXU
  4. vocab projection + select — resident mode (default): single-shot matmul
     over the VMEM-resident W_out then argmax / Gumbel-max / logsumexp;
     streamed mode: W_out double-buffered from HBM in lane-aligned tiles with
     running folds, so [B, V] logits never materialize (for models whose
     weights exceed VMEM)
  5. recorded log-prob is the CLEAN log-softmax of the selected token

Honest status (ARCHITECTURE.md "measured reality"): on v5e this model fits
VMEM entirely and XLA's scan is ~25% faster, so the flag default is off. The
hypothesized streamed-mode win ("when the vocab projection cannot stay
resident") was MEASURED OUT in r3: at V=65,536 (W_out 64MB) XLA still wins by
27% — v5e's real VMEM keeps even that resident (scripts/bench_streamed_vocab.py,
ARCHITECTURE.md "Streamed design-regime test"). The kernel remains a tested
flag-gated alternative for smaller-VMEM TPU generations.

Used by inference (greedy/sample) and the SCST rollouts; gradients for SCST come
from an XLA teacher-forced re-score of the sampled tokens (train/scst.py), so the
kernel is forward-only. Fallback: models/decoding.py XLA path (flag
``model.use_pallas_decoder``). Parity tests: tests/test_pallas_decoder.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidcap_tpu.data.vocab import BOS, EOS, PAD

Array = jax.Array

DMA_WAVE = 8          # concurrent embedding-row gathers
NEG = -1e30


class PallasDecoderWeights(NamedTuple):
    """Decoder weights in the kernel's layout (see from_params)."""

    emb: Array        # bf16[Vp, E]      embedding table (HBM)
    w_gates: Array    # bf16[E+2H, 4H]   fused LSTM weight for x=[emb; ctx; h]
    b_gates: Array    # f32[1, 4H]
    wq: Array         # bf16[H, A]       attention query projection
    u: Array          # f32[1, A]        attention score vector
    w_out: Array      # bf16[H, Vp]      output projection (HBM, streamed)
    b_out: Array      # f32[1, Vp]


def from_params(params) -> PallasDecoderWeights:
    """Repack CaptionDecoder params (models/decoder.py, 1-layer) for the kernel."""
    dec = params["decoder"] if "decoder" in params else params
    emb = dec["embed"]["embedding"]
    w = dec["lstm0"]["w"]          # [(E+H)+H, 4H] — x=[emb;ctx] rows then h rows
    b = dec["lstm0"]["b"]
    wq = dec["attention"]["query"]["kernel"]
    u = dec["attention"]["u"]
    wo = dec["out_proj"]["kernel"]
    bo = dec["out_proj"]["bias"]
    return PallasDecoderWeights(
        emb=emb.astype(jnp.bfloat16),
        w_gates=w.astype(jnp.bfloat16),
        b_gates=b.reshape(1, -1).astype(jnp.float32),
        wq=wq.astype(jnp.bfloat16),
        u=u.reshape(1, -1).astype(jnp.float32),
        w_out=wo.astype(jnp.bfloat16),
        b_out=bo.reshape(1, -1).astype(jnp.float32),
    )


def _pick_tile(vp: int, cap: int = 1024) -> int:
    """Largest multiple of 128 that divides vp and is ≤ cap."""
    best = 128
    for k in range(1, cap // 128 + 1):
        t = 128 * k
        if vp % t == 0:
            best = t
    return best


def _rollout_kernel(
    # inputs
    seed_ref,            # i32[1,1] SMEM
    keys_ref,            # bf16[B, T, A] VMEM
    values_ref,          # bf16[B, T, H] VMEM
    fmask_ref,           # f32[B, T] VMEM
    h0_ref, c0_ref,      # f32[B, H] VMEM
    wg_ref,              # bf16[E+2H, 4H] VMEM
    bg_ref,              # f32[1, 4H] VMEM
    wq_ref,              # bf16[H, A] VMEM
    u_ref,               # f32[1, A] VMEM
    bout_ref,            # f32[1, Vp] VMEM
    emb_hbm,             # bf16[Vp, E] ANY/HBM
    wout_hbm,            # bf16[H, Vp] ANY/HBM
    # outputs (block per step)
    tok_out,             # i32[1, B]
    logp_out,            # f32[1, B]
    mask_out,            # f32[1, B]
    # scratch
    h_s, c_s,            # f32[B, H]
    emb_s,               # bf16[B, E]
    emb8_s,              # bf16[B, 8, E]  aligned gather blocks
    tok_s,               # i32[B1, 128]  (row 0 used; padded for tiling)
    fin_s,               # f32[B1, 128]
    best_noisy_s,        # f32[B, 128]
    best_clean_s,        # f32[B, 128]
    best_idx_s,          # i32[B, 128]
    m_s, s_s,            # f32[B, 128]  running logsumexp (max, sum)
    wout_buf,            # bf16[2, H, TILE]
    emb_sems,            # DMA sems (B,) — all gathers in flight at once
    wout_sems,           # DMA sems (2,)
    *,
    B: int, E: int, H: int, A: int, T: int, Vp: int, TILE: int,
    vocab_size: int, sample: bool, temperature: float, resident: bool,
):
    t_step = pl.program_id(0)
    n_tiles = Vp // TILE

    @pl.when(t_step == 0)
    def _init():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]
        tok_s[:] = jnp.full_like(tok_s[:], BOS)
        fin_s[:] = jnp.zeros_like(fin_s[:])

    # ---- 1. embedding gather (issue) -----------------------------------------
    # Mosaic tiles memrefs (8, 128), so a 1-row slice is illegal; fetch the
    # aligned 8-row block containing each token and select with a one-hot
    # reduction. resident mode: the table lives in VMEM → direct vector loads;
    # streamed mode: ALL B DMAs go into flight at once (per-row semaphores) and
    # land while the attention math below runs — waits happen before the LSTM.
    def emb_dma(b):
        block = pl.multiple_of((tok_s[b, 0] // 8) * 8, 8)
        return pltpu.make_async_copy(
            emb_hbm.at[pl.ds(block, 8), :],
            emb8_s.at[b],
            emb_sems.at[b],
        )

    if resident:
        for b in range(B):
            block = pl.multiple_of((tok_s[b, 0] // 8) * 8, 8)
            emb8_s[b] = emb_hbm[pl.ds(block, 8), :]
    else:
        for b in range(B):
            emb_dma(b).start()

    # ---- 2. attention (overlaps with the gather DMAs) ------------------------
    # precision chain mirrors models/decoder.TemporalAttention exactly (bf16
    # Dense outputs, bf16 add + tanh) so greedy tokens match the XLA path
    h = h_s[:]                                              # f32[B, H]
    q = jnp.dot(h.astype(jnp.bfloat16), wq_ref[:],
                preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)                      # [B, A] bf16
    scores = jax.lax.dot_general(
        jnp.tanh(keys_ref[:] + q[:, None, :]),               # bf16 [B, T, A]
        u_ref[:].astype(jnp.bfloat16),                       # [1, A]
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :, 0]                                               # [B, T]
    scores = jnp.where(fmask_ref[:] > 0, scores, NEG)
    attn = jax.nn.softmax(scores, axis=-1)                   # f32[B, T]
    ctx = jax.lax.dot_general(
        attn[:, None, :].astype(jnp.bfloat16),               # [B, 1, T]
        values_ref[:],                                       # [B, T, H]
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]                                               # f32[B, H]

    # ---- 3. LSTM fused-gate matmul -------------------------------------------
    # collect the gathered embedding blocks, select rows via one-hot reduction
    if not resident:
        for b in range(B):
            emb_dma(b).wait()
    sub = tok_s[0:B, 0:1] % 8                                     # [B, 1]
    onehot8 = (jax.lax.broadcasted_iota(jnp.int32, (B, 8), 1)
               == sub).astype(jnp.float32)                        # [B, 8]
    emb_s[:] = (emb8_s[:].astype(jnp.float32)
                * onehot8[:, :, None]).sum(axis=1).astype(jnp.bfloat16)

    xh = jnp.concatenate(
        [emb_s[:].astype(jnp.float32), ctx, h], axis=-1
    ).astype(jnp.bfloat16)                                   # [B, E+2H]
    gates = jnp.dot(xh, wg_ref[:],
                    preferred_element_type=jnp.float32) + bg_ref[:]
    i_g = gates[:, 0 * H:1 * H]
    f_g = gates[:, 1 * H:2 * H]
    g_g = gates[:, 2 * H:3 * H]
    o_g = gates[:, 3 * H:4 * H]
    c_new = (jax.nn.sigmoid(f_g + 1.0) * c_s[:]
             + jax.nn.sigmoid(i_g) * jnp.tanh(g_g))
    h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c_new)
    c_s[:] = c_new
    h_s[:] = h_new
    h_bf = h_new.astype(jnp.bfloat16)

    # ---- 4. vocab projection + select ----------------------------------------
    inv_t0 = 1.0 / temperature

    def gumbel_noise(clean, col_base, cols):
        row = jax.lax.broadcasted_iota(jnp.uint32, clean.shape, 0)
        colu = (jax.lax.broadcasted_iota(jnp.uint32, clean.shape, 1)
                + jnp.uint32(col_base))
        x = ((row * jnp.uint32(0x9E3779B9))
             ^ (colu * jnp.uint32(0x85EBCA6B))
             ^ (seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
                + t_step.astype(jnp.uint32) * jnp.uint32(0x165667B1)))
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        uni = (x >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
        return clean - jnp.log(-jnp.log(uni))

    if resident:
        # single-shot: one MXU matmul over the full vocab + one argmax/lse —
        # no tile loop (W_out and the [B, Vp] logits both fit VMEM on v5e)
        logits_full = (jnp.dot(h_bf, wout_hbm[:],
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
                       + bout_ref[:].astype(jnp.bfloat16)
                       ).astype(jnp.float32)                  # [B, Vp]
        colf = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
        clean_full = jnp.where(colf < vocab_size, logits_full * inv_t0, NEG)
        noisy_full = (gumbel_noise(clean_full, 0, Vp) if sample
                      else clean_full)
        m_full = jnp.max(clean_full, axis=-1, keepdims=True)
        lse_full = m_full + jnp.log(jnp.sum(jnp.exp(clean_full - m_full),
                                            axis=-1, keepdims=True))
        n_arg = jnp.argmax(noisy_full, axis=-1)[:, None]      # [B, 1]
        c_win = jnp.max(jnp.where(colf == n_arg, clean_full, NEG),
                        axis=-1, keepdims=True)
        best_idx_s[:, 0:1] = n_arg.astype(jnp.int32)
        best_clean_s[:, 0:1] = c_win
        m_s[:, 0:1] = lse_full            # store lse directly
        s_s[:, 0:1] = jnp.ones_like(lse_full)

    if not resident:
        # streamed variant (vocabularies too large for VMEM residency):
        # double-buffered W_out tiles + running argmax/lse
        best_noisy_s[:] = jnp.full_like(best_noisy_s[:], NEG)
        best_clean_s[:] = jnp.zeros_like(best_clean_s[:])
        best_idx_s[:] = jnp.zeros_like(best_idx_s[:])
        m_s[:] = jnp.full_like(m_s[:], NEG)
        s_s[:] = jnp.zeros_like(s_s[:])

        def wout_dma(j, slot):
            return pltpu.make_async_copy(
                wout_hbm.at[:, pl.ds(j * TILE, TILE)],
                wout_buf.at[slot],
                wout_sems.at[slot],
            )

        wout_dma(0, 0).start()

        def tile_body(j, _):
            slot = j % 2

            @pl.when(j + 1 < n_tiles)
            def _():
                wout_dma(j + 1, (j + 1) % 2).start()

            wout_dma(j, slot).wait()
            # mirror flax Dense(dtype=bf16): matmul rounded to bf16, bias in
            # bf16, THEN upcast to f32 (models/decoder._step_from_emb)
            logits = (jnp.dot(h_bf, wout_buf[slot],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
                      + bout_ref[0, pl.ds(j * TILE, TILE)][None, :]
                      .astype(jnp.bfloat16)).astype(jnp.float32)  # [B, TILE]
            col = jax.lax.broadcasted_iota(jnp.int32, (B, TILE), 1) + j * TILE
            clean = jnp.where(col < vocab_size, logits * inv_t0, NEG)
            noisy = gumbel_noise(clean, j * TILE, TILE) if sample else clean

            # running logsumexp over clean logits
            t_max = jnp.max(clean, axis=-1, keepdims=True)        # [B, 1]
            m_old = m_s[:, 0:1]
            m_new = jnp.maximum(m_old, t_max)
            s_s[:, 0:1] = (s_s[:, 0:1] * jnp.exp(m_old - m_new)
                           + jnp.sum(jnp.exp(clean - m_new), axis=-1,
                                     keepdims=True))
            m_s[:, 0:1] = m_new

            # running (noisy) argmax; record the CLEAN logit of the winner
            # (mask-max select instead of take_along_axis — Mosaic's gather
            # lowering only supports full-shape index arrays)
            n_max = jnp.max(noisy, axis=-1, keepdims=True)
            n_arg = jnp.argmax(noisy, axis=-1)[:, None]           # [B, 1]
            local = jax.lax.broadcasted_iota(jnp.int32, (B, TILE), 1)
            c_of_win = jnp.max(jnp.where(local == n_arg, clean, NEG),
                               axis=-1, keepdims=True)
            better = n_max > best_noisy_s[:, 0:1]
            best_noisy_s[:, 0:1] = jnp.where(better, n_max,
                                             best_noisy_s[:, 0:1])
            best_clean_s[:, 0:1] = jnp.where(better, c_of_win,
                                             best_clean_s[:, 0:1])
            best_idx_s[:, 0:1] = jnp.where(
                better, n_arg.astype(jnp.int32) + j * TILE,
                best_idx_s[:, 0:1])
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    # ---- 5. finalize token / logp / mask --------------------------------------
    finished = fin_s[0:B, 0:1]                                    # f32[B, 1]
    sel = best_idx_s[:, 0:1]
    tok_new = jnp.where(finished > 0, PAD, sel)                   # i32[B, 1]
    lse = m_s[:, 0:1] + jnp.log(jnp.maximum(s_s[:, 0:1], 1e-30))
    logp = jnp.where(finished > 0, 0.0, best_clean_s[:, 0:1] - lse)
    step_mask = 1.0 - finished

    tok_out[pl.ds(t_step, 1), :] = tok_new[:, 0][None, :]
    logp_out[pl.ds(t_step, 1), :] = logp[:, 0][None, :]
    mask_out[pl.ds(t_step, 1), :] = step_mask[:, 0][None, :]

    fin_s[0:B, 0:1] = jnp.maximum(
        finished, (tok_new == EOS).astype(jnp.float32))
    tok_s[0:B, 0:1] = tok_new


def pallas_rollout(
    weights: PallasDecoderWeights,
    keys: Array,           # bf16/f32[B, T, A] precomputed attention keys
    values: Array,         # [B, T, H] projected features
    frame_mask: Array,     # f32[B, T]
    h0: Array, c0: Array,  # f32[B, H] (single layer)
    max_len: int,
    vocab_size: int,
    sample: bool = False,
    seed: int | Array = 0,
    temperature: float = 1.0,
    interpret: bool = False,
    resident_wout: bool = True,
) -> Tuple[Array, Array, Array]:
    """Run the fused rollout. Returns (tokens i32[B, L], logp f32[B, L],
    mask f32[B, L]) with the same semantics as models/decoding greedy/sample."""
    B, T, A = keys.shape
    H = values.shape[-1]
    Vp, E = weights.emb.shape
    TILE = _pick_tile(Vp)
    if B % 8:
        raise ValueError(f"batch {B} must be a multiple of 8")
    if jax.default_backend() == "cpu":
        interpret = True    # Mosaic is TPU-only; CPU (tests) runs interpreted

    # VMEM budget: resident attention tensors + LSTM weights + scratch must fit
    # the ~16MB core VMEM, or Mosaic fails late with an opaque allocation error
    vmem = (B * T * (A + H) * 2          # keys + values (bf16)
            + (E + 2 * H) * 4 * H * 2    # fused LSTM weight (bf16)
            + 2 * H * TILE * 2           # W_out double buffer
            + B * (2 * H * 4 + E * 2 + 8 * E * 2 + 6 * 128 * 4)  # state/scratch
            + Vp * 4)                    # b_out
    if resident_wout:
        vmem += H * Vp * 2 + Vp * E * 2  # W_out + embedding table resident
        vmem += B * Vp * 4               # single-shot logits buffer
    budget = (100 if resident_wout else 15) * 1024 * 1024
    if not interpret and vmem > budget:
        raise ValueError(
            f"pallas_rollout VMEM estimate {vmem/1e6:.1f}MB exceeds budget; "
            f"reduce batch (B={B}) or frames (T={T}), or set "
            f"resident_wout=False to stream W_out from HBM")

    kern = functools.partial(
        _rollout_kernel, B=B, E=E, H=H, A=A, T=T, Vp=Vp, TILE=TILE,
        vocab_size=vocab_size, sample=sample, temperature=float(temperature),
        resident=resident_wout)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(max_len,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # seed
            pl.BlockSpec(memory_space=pltpu.VMEM),    # keys
            pl.BlockSpec(memory_space=pltpu.VMEM),    # values
            pl.BlockSpec(memory_space=pltpu.VMEM),    # frame_mask
            pl.BlockSpec(memory_space=pltpu.VMEM),    # h0
            pl.BlockSpec(memory_space=pltpu.VMEM),    # c0
            pl.BlockSpec(memory_space=pltpu.VMEM),    # w_gates
            pl.BlockSpec(memory_space=pltpu.VMEM),    # b_gates
            pl.BlockSpec(memory_space=pltpu.VMEM),    # wq
            pl.BlockSpec(memory_space=pltpu.VMEM),    # u
            pl.BlockSpec(memory_space=pltpu.VMEM),    # b_out
            pl.BlockSpec(memory_space=(pltpu.VMEM if resident_wout
                                       else pltpu.HBM)),  # emb table
            pl.BlockSpec(memory_space=(pltpu.VMEM if resident_wout
                                       else pltpu.HBM)),  # w_out
        ],
        out_specs=[
            # full arrays resident in VMEM across the sequential grid (tiny:
            # [L, B]); rows written per step, flushed once at the end
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),          # h
            pltpu.VMEM((B, H), jnp.float32),          # c
            pltpu.VMEM((B, E), jnp.bfloat16),         # emb
            pltpu.VMEM((B, 8, E), jnp.bfloat16),      # emb8 gather blocks
            pltpu.VMEM((B, 128), jnp.int32),          # tok
            pltpu.VMEM((B, 128), jnp.float32),        # finished
            pltpu.VMEM((B, 128), jnp.float32),        # best_noisy
            pltpu.VMEM((B, 128), jnp.float32),        # best_clean
            pltpu.VMEM((B, 128), jnp.int32),          # best_idx
            pltpu.VMEM((B, 128), jnp.float32),        # m
            pltpu.VMEM((B, 128), jnp.float32),        # s
            pltpu.VMEM((2, H, TILE), jnp.bfloat16),   # wout double buffer
            pltpu.SemaphoreType.DMA((B,)),            # per-row gather sems
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    tok, logp, mask = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((max_len, B), jnp.int32),
            jax.ShapeDtypeStruct((max_len, B), jnp.float32),
            jax.ShapeDtypeStruct((max_len, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=(100 * 1024 * 1024 if resident_wout else None)),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        keys.astype(jnp.bfloat16),
        values.astype(jnp.bfloat16),
        frame_mask.astype(jnp.float32),
        h0.astype(jnp.float32), c0.astype(jnp.float32),
        weights.w_gates, weights.b_gates, weights.wq, weights.u,
        weights.b_out, weights.emb, weights.w_out,
    )
    return tok.T, logp.T, mask.T


def model_rollout(model, params, feats: Array, max_len: int,
                  sample: bool = False, seed: int | Array = 0,
                  temperature: float = 1.0, interpret: bool = False,
                  frame_mask: Array | None = None):
    """Convenience wrapper: build the decode state with the model's own
    init_state (feat/key projections + h0/c0 — one-time XLA work per batch),
    then run the fused Pallas rollout. Returns a models/decoding.Rollout.

    Only 1-layer-LSTM attention decoders route here (the reference config,
    SURVEY.md C8); others fall back to the XLA path.
    """
    from vidcap_tpu.models.decoding import Rollout
    from vidcap_tpu.models.model import VidCapModel

    state = model.apply({"params": params}, feats, frame_mask,
                        method=VidCapModel.init_state)
    weights = from_params(params)
    toks, logp, mask = pallas_rollout(
        weights, state.keys, state.values, state.frame_mask,
        state.h[0], state.c[0], max_len=max_len,
        vocab_size=model.vocab_size, sample=sample, seed=seed,
        temperature=temperature, interpret=interpret)
    return Rollout(tokens=toks, logp=logp, mask=mask)
