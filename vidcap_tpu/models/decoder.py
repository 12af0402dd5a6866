"""Temporal-attention LSTM caption decoder (SURVEY.md C7, C8).

TPU-first design notes (vs. the reference's graph-build-time unrolled TF1 loop,
SURVEY.md §3.1):

* The teacher-forced XE path is ONE ``lax.scan`` over time — traced once, static
  shapes, fused by XLA. Token embeddings for the whole sequence and the attention
  keys (``feats @ W_k``) are precomputed OUTSIDE the scan so the per-step body is
  only the recurrent matmuls + attention softmax.
* All decode strategies (greedy / multinomial / beam, models/decoding.py) reuse the
  same single :meth:`CaptionDecoder.step`, so the rollout loops in SCST never leave
  the device (BASELINE.json north_star).
* Matmuls run in ``compute_dtype`` (bfloat16 → MXU); the recurrent state and logits
  stay float32 for numerical stability.
* The LSTM cell is hand-rolled with one fused gate matmul ``[x, h] @ W → 4H`` —
  exactly the layout the Pallas fused decoder-step kernel (ops/pallas_decoder.py)
  consumes, so the kernel and XLA paths share parameters.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidcap_tpu.config import ModelConfig

Array = jax.Array


@dataclasses.dataclass
class DecoderState:
    """Carried decode state. All leaves are per-example (leading batch dim) except
    ``keys``/``values``, which are per-video attention tensors."""

    h: Array          # f32[num_layers, B, H]
    c: Array          # f32[num_layers, B, H]
    keys: Array       # bf16[B, T, A]  precomputed attention keys (feats @ W_k)
    values: Array     # bf16[B, T, Dv] projected frame features (attention values)
    frame_mask: Array  # f32[B, T]     1.0 for real frames


jax.tree_util.register_pytree_node(
    DecoderState,
    lambda s: ((s.h, s.c, s.keys, s.values, s.frame_mask), None),
    lambda _, ch: DecoderState(*ch),
)


class LSTMCell(nn.Module):
    """Fused-gate LSTM cell: gates = [x, h] @ W + b, in compute_dtype on the MXU."""

    hidden_dim: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, h: Array, c: Array) -> Tuple[Array, Array]:
        H = self.hidden_dim
        in_dim = x.shape[-1] + H
        w = self.param("w", nn.initializers.glorot_uniform(), (in_dim, 4 * H),
                       jnp.float32)
        b = self.param("b", nn.initializers.zeros, (4 * H,), jnp.float32)
        xh = jnp.concatenate([x, h], axis=-1).astype(self.compute_dtype)
        gates = jnp.dot(xh, w.astype(self.compute_dtype),
                        preferred_element_type=jnp.float32) + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        return new_h, new_c


class TemporalAttention(nn.Module):
    """Bahdanau-style soft attention over frames (SURVEY.md C7).

    ``score(h, v_i) = u · tanh(keys_i + W_h h)``; keys are precomputed per video.
    """

    attn_dim: int
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        self.query = nn.Dense(self.attn_dim, use_bias=False, name="query",
                              dtype=self.compute_dtype, param_dtype=jnp.float32)
        self.u = self.param("u", nn.initializers.normal(0.05),
                            (self.attn_dim,), jnp.float32)

    def __call__(self, h: Array, keys: Array, values: Array, frame_mask: Array
                 ) -> Tuple[Array, Array]:
        """h: f32[B, H]; keys: [B, T, A]; values: [B, T, Dv] → (ctx f32[B, Dv], attn f32[B, T])."""
        q = self.query(h.astype(self.compute_dtype))
        scores = jnp.einsum(
            "bta,a->bt",
            jnp.tanh(keys + q[:, None, :]).astype(self.compute_dtype),
            self.u.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(frame_mask > 0, scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bt,btd->bd", attn.astype(self.compute_dtype), values,
                         preferred_element_type=jnp.float32)
        return ctx, attn

    def beam(self, h_top: Array, keys: Array, values: Array,
             frame_mask: Array) -> Array:
        """Beam-broadcast attention: h_top f32[B, K, H]; keys/values/frame_mask
        per-VIDEO ([B, T, ·]) → ctx f32[B, K, Dv]. Same math/precision as
        __call__, but the K beams of a video share one read of keys/values —
        ~K× less attention HBM traffic per decode step."""
        q = self.query(h_top.astype(self.compute_dtype))     # [B, K, A]
        scores = jnp.einsum(
            "btka,a->bkt",
            jnp.tanh(keys[:, :, None, :] + q[:, None, :, :]
                     ).astype(self.compute_dtype),
            self.u.astype(self.compute_dtype),
            preferred_element_type=jnp.float32)              # [B, K, T]
        scores = jnp.where(frame_mask[:, None, :] > 0, scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bkt,btd->bkd", attn.astype(self.compute_dtype),
                          values, preferred_element_type=jnp.float32)


class CaptionDecoder(nn.Module):
    """Embedding + (attention) + LSTM stack + vocab projection (SURVEY.md C8).

    The module exposes three entry points via flax ``method=``:
      * ``init_state(feats, frame_mask)`` — encode video, build h0/c0 + attention keys
      * ``step(state, token)``            — one decode step → (state, f32 logits)
      * ``xe_logits(feats, frame_mask, inputs)`` — teacher-forced logits [B, L, V]
      * ``encode_video(feats, frame_mask)``      — shared encoder vector for heads
    """

    cfg: ModelConfig
    vocab_size: int          # true vocab size (logits beyond this are masked to -inf)
    padded_vocab: int        # vocab padded to a lane multiple (MXU tiling)
    feature_dim: int
    deterministic: bool = True   # False only in training-mode instances (dropout)

    def setup(self):
        c = self.cfg
        self.compute_dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        self.embed = nn.Embed(self.padded_vocab, c.embed_dim,
                              param_dtype=jnp.float32, name="embed")
        self.feat_proj = nn.Dense(c.hidden_dim, name="feat_proj",
                                  dtype=self.compute_dtype, param_dtype=jnp.float32)
        self.key_proj = nn.Dense(c.attn_dim, use_bias=False, name="key_proj",
                                 dtype=self.compute_dtype, param_dtype=jnp.float32)
        self.init_proj = nn.Dense(2 * c.hidden_dim * c.num_lstm_layers,
                                  name="init_proj", dtype=self.compute_dtype,
                                  param_dtype=jnp.float32)
        self.cells = [LSTMCell(c.hidden_dim, self.compute_dtype, name=f"lstm{i}")
                      for i in range(c.num_lstm_layers)]
        if c.use_attention:
            self.attention = TemporalAttention(c.attn_dim, self.compute_dtype,
                                               name="attention")
        self.out_proj = nn.Dense(self.padded_vocab, name="out_proj",
                                 dtype=self.compute_dtype, param_dtype=jnp.float32)
        self.dropout = nn.Dropout(rate=c.dropout_rate)

    # ------------------------------------------------------------------ encoding

    def encode_video(self, feats: Array, frame_mask: Array) -> Array:
        """Masked-mean-pooled projected features — the shared video encoder output
        the multitask attribute head consumes (SURVEY.md C15)."""
        proj = self.feat_proj(feats.astype(self.compute_dtype)).astype(jnp.float32)
        denom = jnp.maximum(frame_mask.sum(-1, keepdims=True), 1.0)
        return (proj * frame_mask[..., None]).sum(1) / denom  # f32[B, H]

    def init_state(self, feats: Array, frame_mask: Optional[Array] = None
                   ) -> DecoderState:
        B, T, _ = feats.shape
        c = self.cfg
        if frame_mask is None:
            frame_mask = jnp.ones((B, T), dtype=jnp.float32)
        values = self.feat_proj(feats.astype(self.compute_dtype))  # [B, T, H]
        pooled = self.encode_video(feats, frame_mask)              # f32[B, H]
        hc = jnp.tanh(self.init_proj(pooled.astype(self.compute_dtype))
                      ).astype(jnp.float32)
        hc = hc.reshape(B, 2, c.num_lstm_layers, c.hidden_dim).transpose(1, 2, 0, 3)
        h, cc = hc[0], hc[1]                                       # [L, B, H]
        if c.use_attention:
            keys = self.key_proj(values)                           # [B, T, A]
        else:
            keys = jnp.zeros((B, T, c.attn_dim), dtype=self.compute_dtype)
        return DecoderState(h=h, c=cc, keys=keys, values=values,
                            frame_mask=frame_mask)

    # ------------------------------------------------------------------ stepping

    def _lstm_logits(self, state: DecoderState, emb: Array, ctx: Array,
                     keep_compute_dtype: bool = False,
                     skip_vocab_mask: bool = False
                     ) -> Tuple[DecoderState, Array]:
        """Shared LSTM stack + vocab projection given the attention context.

        keep_compute_dtype=True skips the f32 upcast of the [B, V] logits.
        When compute_dtype is bf16 the Dense output IS bf16 (rounded), so the
        upcast adds no information — but it doubles the HBM footprint of the
        buffer the beam top-k then sweeps five times. Values are identical
        either way; only the storage dtype changes."""
        x = jnp.concatenate([emb, ctx], axis=-1)
        if self.cfg.dropout_rate > 0:
            x = self.dropout(x, deterministic=self.deterministic)
        new_h, new_c = [], []
        for i, cell in enumerate(self.cells):
            hi, ci = cell(x, state.h[i], state.c[i])
            new_h.append(hi)
            new_c.append(ci)
            x = hi
        if self.cfg.dropout_rate > 0:
            x = self.dropout(x, deterministic=self.deterministic)
        logits = self.out_proj(x.astype(self.compute_dtype))
        if not keep_compute_dtype:
            logits = logits.astype(jnp.float32)
        # mask padding vocab entries so decode strategies can never emit them
        # (-1e30 is representable in bf16 — same 8-bit exponent as f32).
        # skip_vocab_mask: callers that pre-fold the mask into out_proj.bias
        # (bias[vocab_size:] = -1e30; bit-identical since |x·W| ≪ 2⁻⁹·1e30
        # rounds away in both f32 and bf16) skip this full-buffer where.
        if not skip_vocab_mask:
            logits = jnp.where(
                jnp.arange(self.padded_vocab) < self.vocab_size, logits,
                jnp.asarray(-1e30, logits.dtype))
        new_state = DecoderState(h=jnp.stack(new_h), c=jnp.stack(new_c),
                                 keys=state.keys, values=state.values,
                                 frame_mask=state.frame_mask)
        return new_state, logits

    def _step_from_emb(self, state: DecoderState, emb: Array,
                       keep_compute_dtype: bool = False
                       ) -> Tuple[DecoderState, Array]:
        c = self.cfg
        if c.use_attention:
            ctx, _ = self.attention(state.h[-1], state.keys, state.values,
                                    state.frame_mask)
        else:
            denom = jnp.maximum(state.frame_mask.sum(-1, keepdims=True), 1.0)
            ctx = ((state.values.astype(jnp.float32)
                    * state.frame_mask[..., None]).sum(1) / denom)
        return self._lstm_logits(state, emb, ctx,
                                 keep_compute_dtype=keep_compute_dtype)

    def step(self, state: DecoderState, token: Array,
             keep_compute_dtype: bool = False
             ) -> Tuple[DecoderState, Array]:
        """One decode step. token: i32[B] (previous token) → logits f32[B, V]
        (or the compute dtype when keep_compute_dtype — values identical,
        see _lstm_logits)."""
        emb = self.embed(token).astype(jnp.float32)
        return self._step_from_emb(state, emb, keep_compute_dtype)

    def step_beam_hidden(self, state: DecoderState, token: Array,
                         beam_width: int) -> Tuple[DecoderState, Array]:
        """Like step_beam but returns the new top-layer hidden state INSTEAD of
        logits — the fused Pallas project+top-K kernel (ops/pallas_topk.py)
        consumes h directly so the [B·K, V] logits are never materialized."""
        c = self.cfg
        K = beam_width
        B = state.keys.shape[0]
        emb = self.embed(token).astype(jnp.float32)
        if c.use_attention:
            h_top = state.h[-1].reshape(B, K, -1)
            ctx = self.attention.beam(h_top, state.keys, state.values,
                                      state.frame_mask).reshape(B * K, -1)
        else:
            denom = jnp.maximum(state.frame_mask.sum(-1, keepdims=True), 1.0)
            pooled = ((state.values.astype(jnp.float32)
                       * state.frame_mask[..., None]).sum(1) / denom)
            ctx = jnp.repeat(pooled, K, axis=0)
        x = jnp.concatenate([emb, ctx], axis=-1)
        new_h, new_c = [], []
        for i, cell in enumerate(self.cells):
            hi, ci = cell(x, state.h[i], state.c[i])
            new_h.append(hi)
            new_c.append(ci)
            x = hi
        new_state = DecoderState(h=jnp.stack(new_h), c=jnp.stack(new_c),
                                 keys=state.keys, values=state.values,
                                 frame_mask=state.frame_mask)
        return new_state, x

    def step_beam(self, state: DecoderState, token: Array, beam_width: int,
                  keep_compute_dtype: bool = False,
                  skip_vocab_mask: bool = False
                  ) -> Tuple[DecoderState, Array]:
        """Beam decode step with per-VIDEO attention tensors.

        state.h/c are [layers, B·K, H] (beam-tiled) but keys/values/frame_mask
        stay [B, T, ·] — attention broadcasts over the beam axis instead of
        reading K duplicated copies from HBM (beam-5 at B=128 saves ~27MB of
        HBM reads per decode step vs tiling; SURVEY.md §3.3 TPU build)."""
        c = self.cfg
        K = beam_width
        B = state.keys.shape[0]
        emb = self.embed(token).astype(jnp.float32)        # [B*K, E]
        if c.use_attention:
            h_top = state.h[-1].reshape(B, K, -1)
            ctx = self.attention.beam(h_top, state.keys, state.values,
                                      state.frame_mask)     # [B, K, H]
            ctx = ctx.reshape(B * K, -1)
        else:
            denom = jnp.maximum(state.frame_mask.sum(-1, keepdims=True), 1.0)
            pooled = ((state.values.astype(jnp.float32)
                       * state.frame_mask[..., None]).sum(1) / denom)  # [B, H]
            ctx = jnp.repeat(pooled, K, axis=0)
        return self._lstm_logits(state, emb, ctx,
                                 keep_compute_dtype=keep_compute_dtype,
                                 skip_vocab_mask=skip_vocab_mask)

    # ------------------------------------------------------------------ XE path

    def xe_logits(self, feats: Array, frame_mask: Optional[Array],
                  inputs: Array) -> Array:
        """Teacher-forced logits. inputs: i32[B, L] (BOS-shifted tokens) → f32[B, L, V].

        One ``lax.scan`` over L; embeddings for the whole sequence are gathered in a
        single batched lookup outside the scan (SURVEY.md §3.1 "TPU build difference").
        """
        state = self.init_state(feats, frame_mask)
        embs = self.embed(inputs).astype(jnp.float32)    # [B, L, E]
        embs_t = embs.transpose(1, 0, 2)                 # [L, B, E] scan-major
        _, logits = jax.lax.scan(
            lambda st, e: self._step_from_emb(st, e), state, embs_t)
        return logits.transpose(1, 0, 2)                 # [B, L, V]

    # ------------------------------------------------------------------ init

    def init_all(self, feats: Array, frame_mask: Optional[Array],
                 token: Array) -> Array:
        """Parameter-initialization entry point: touches every submodule once
        OUTSIDE any scan (flax cannot create params inside ``lax.scan``)."""
        state = self.init_state(feats, frame_mask)
        _, logits = self.step(state, token)
        return logits
