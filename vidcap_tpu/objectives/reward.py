"""On-device CIDEr-D (+ BLEU-4) reward — batched XLA ops, zero host round-trips
(SURVEY.md §3.2 "headline 10× lever"; BASELINE.json: "the CIDEr/BLEU reward and
policy-gradient baseline are computed as batched device ops").

Math (identical to metrics/cider.py == pycocoevalcap semantics, via the
per-position trick): for a unique gram g with candidate count tf_c appearing at
tf_c positions, summing  f(g)/tf_c  over its positions equals f(g) once. So

  dot_n(c, r)   = Σ_{i ∈ order n} min(tf_c_i, tf_r_i) · tf_r_i · idf_i² / tf_c_i
  ‖vec_c‖²_n    = Σ_{i ∈ order n} tf_c_i · idf_i²        (= Σ_g tf_c² idf²)

where tf_r_i / idf_i come from matching position i's hashed key against the
video's reference table, and the candidate-norm idf comes from the corpus IDF
hash table (miss ⇒ log N, the df=0 weight).

Everything is fixed-shape: [B, 4·L] candidate gram keys vs [B, R, G] reference
entries → one [B, 4L, R·G] masked-equality contraction on the VPU.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vidcap_tpu.data.vocab import EOS
from vidcap_tpu.objectives.reward_tables import NGRAMS, RewardTables

Array = jax.Array
SIGMA = 6.0


def caption_mask(tokens: Array, mask: Array) -> Array:
    """Rollout mask includes <eos>; the scored caption excludes it
    (references are stored without specials)."""
    return mask * (tokens != EOS).astype(mask.dtype)


def _candidate_keys(tokens: Array, cmask: Array
                    ) -> Tuple[Array, Array, Array, Array]:
    """tokens i32[B, L] → keys/valid for all orders stacked: u32[B, 4L] lo/hi,
    f32[B, 4L] validity, i32[B, 4L] order tag."""
    from vidcap_tpu.ops.ngram_hash import device_ngram_keys
    B, L = tokens.shape
    los, his = device_ngram_keys(tokens, NGRAMS)
    lo = jnp.concatenate(los, axis=-1)            # [B, 4L]
    hi = jnp.concatenate(his, axis=-1)
    valids, orders = [], []
    for n in range(1, NGRAMS + 1):
        v = cmask
        for k in range(1, n):
            v = v * jnp.roll(cmask, -k, axis=-1)
        # positions within L-n+1 only (roll wraps, so cut the tail explicitly)
        pos_ok = (jnp.arange(L) < L - n + 1).astype(cmask.dtype)
        valids.append(v * pos_ok[None, :])
        orders.append(jnp.full((B, L), n, jnp.int32))
    return lo, hi, jnp.concatenate(valids, -1), jnp.concatenate(orders, -1)


def _idf_lookup(lo: Array, hi: Array, tables: RewardTables) -> Array:
    """Corpus IDF weight per candidate gram via fixed-probe open addressing."""
    S = tables.idf_key_lo.shape[0]
    slot = (lo % jnp.uint32(S)).astype(jnp.int32)         # [B, 4L]
    val = jnp.full(lo.shape, tables.log_n, jnp.float32)
    found = jnp.zeros(lo.shape, bool)
    for p in range(tables.num_probes):
        s = (slot + p) % S
        k_lo = tables.idf_key_lo[s]
        k_hi = tables.idf_key_hi[s]
        hit = (k_lo == lo) & (k_hi == hi) & (~found)
        val = jnp.where(hit, tables.idf_val[s], val)
        found = found | hit
    return val


def cider_reward(tables: RewardTables, video_idx: Array, tokens: Array,
                 mask: Array) -> Array:
    """CIDEr-D of each rollout against its video's references.

    video_idx i32[B]; tokens i32[B, L]; mask f32[B, L] (rollout mask incl. <eos>).
    Returns f32[B]. Exact pycocoevalcap semantics modulo 64-bit hash collisions.
    """
    B, L = tokens.shape
    cmask = caption_mask(tokens, mask)
    lo, hi, valid, order = _candidate_keys(tokens, cmask)   # [B, 4L]

    # within-candidate term frequencies: positions of the same order with equal keys
    same = ((lo[:, :, None] == lo[:, None, :]) &
            (hi[:, :, None] == hi[:, None, :]) &
            (order[:, :, None] == order[:, None, :]))
    tf_c = jnp.einsum("bij,bj->bi", same.astype(jnp.float32), valid)  # [B, 4L]
    tf_c = jnp.maximum(tf_c, 1.0)   # pad positions: avoid div-by-zero

    idf_c = _idf_lookup(lo, hi, tables)                      # [B, 4L]

    # candidate norms per order
    order_onehot = (order[:, :, None] ==
                    jnp.arange(1, NGRAMS + 1)[None, None, :])  # [B, 4L, 4]
    norm_sq = jnp.einsum("bi,bin->bn",
                         valid * tf_c * idf_c * idf_c,
                         order_onehot.astype(jnp.float32)) / 1.0
    # Σ_i tf_c·idf² double-counts: each position of g contributes tf_c·idf², and
    # g has tf_c positions → Σ_g tf_c²·idf² requires dividing by tf_c once:
    # Σ_i (tf_c·idf²)/1 = Σ_g tf_c²·idf². (per-position sum already equals it)
    norm_c = jnp.sqrt(norm_sq)                               # [B, 4]

    # reference tables for this batch
    r_lo = tables.ref_key_lo[video_idx]                      # [B, R, G]
    r_hi = tables.ref_key_hi[video_idx]
    r_tf = tables.ref_tf[video_idx]
    r_idf = tables.ref_idf[video_idx]
    r_norm = tables.ref_norm[video_idx]                      # [B, R, 4]
    r_len = tables.ref_len[video_idx]                        # [B, R]
    r_valid = tables.ref_valid[video_idx]                    # [B, R]
    n_refs = tables.num_refs[video_idx]                      # [B]

    Bq, R, G = r_lo.shape
    # match candidate grams against reference entries: [B, 4L, R, G]
    eq = ((lo[:, :, None, None] == r_lo[:, None, :, :]) &
          (hi[:, :, None, None] == r_hi[:, None, :, :]))
    eqf = eq.astype(jnp.float32)
    tf_r = jnp.einsum("birg,brg->bir", eqf, r_tf)            # [B, 4L, R]
    idf_r = jnp.einsum("birg,brg->bir", eqf, r_idf)          # ref-entry idf (=corpus idf)

    # per-position clipped dot contribution, divided by tf_c to undo duplication
    contrib = (jnp.minimum(tf_c[:, :, None], tf_r) * tf_r *
               idf_r * idf_r / tf_c[:, :, None])             # [B, 4L, R]
    contrib = contrib * valid[:, :, None]
    dot = jnp.einsum("bir,bin->bnr", contrib,
                     order_onehot.astype(jnp.float32))       # [B, 4, R]

    denom = norm_c[:, :, None] * jnp.swapaxes(r_norm, 1, 2)  # [B, 4, R]
    val = jnp.where(denom > 0, dot / jnp.maximum(denom, 1e-12), 0.0)

    len_c = cmask.sum(-1)                                    # [B]
    delta = len_c[:, None] - r_len                           # [B, R]
    pen = jnp.exp(-(delta ** 2) / (2 * SIGMA ** 2)) * r_valid

    per_ref = val.mean(axis=1) * pen                         # mean over orders, [B, R]
    return per_ref.sum(-1) / jnp.maximum(n_refs, 1.0) * 10.0


def bleu4_reward(tables: RewardTables, video_idx: Array, tokens: Array,
                 mask: Array) -> Array:
    """Smoothed sentence BLEU-4 (metrics/bleu.sentence_bleu4 semantics) as a
    batched device op — the optional reward mix (BASELINE.json configs[4])."""
    B, L = tokens.shape
    cmask = caption_mask(tokens, mask)
    lo, hi, valid, order = _candidate_keys(tokens, cmask)

    same = ((lo[:, :, None] == lo[:, None, :]) &
            (hi[:, :, None] == hi[:, None, :]) &
            (order[:, :, None] == order[:, None, :]))
    tf_c = jnp.maximum(
        jnp.einsum("bij,bj->bi", same.astype(jnp.float32), valid), 1.0)

    r_lo = tables.ref_key_lo[video_idx]
    r_hi = tables.ref_key_hi[video_idx]
    r_tf = tables.ref_tf[video_idx]
    r_len = tables.ref_len[video_idx]
    r_valid = tables.ref_valid[video_idx]

    eqf = ((lo[:, :, None, None] == r_lo[:, None, :, :]) &
           (hi[:, :, None, None] == r_hi[:, None, :, :])).astype(jnp.float32)
    tf_r = jnp.einsum("birg,brg->bir", eqf, r_tf)            # [B, 4L, R]
    tf_r_max = tf_r.max(axis=-1)                             # max over refs [B, 4L]

    order_onehot = (order[:, :, None] ==
                    jnp.arange(1, NGRAMS + 1)[None, None, :]).astype(jnp.float32)
    clip = jnp.einsum("bi,bin->bn",
                      valid * jnp.minimum(tf_c, tf_r_max) / tf_c, order_onehot)
    tot = jnp.einsum("bi,bin->bn", valid, order_onehot)
    p = (clip + 1.0) / (tot + 1.0)
    logp = jnp.log(jnp.maximum(p, 1e-12)).mean(axis=-1)      # [B]

    len_c = cmask.sum(-1)
    # closest reference length (ties → shorter)
    diff = jnp.abs(r_len - len_c[:, None]) + (1.0 - r_valid) * 1e9
    tie = r_len * 1e-6
    closest = r_len[jnp.arange(B), jnp.argmin(diff + tie, axis=-1)]
    bp = jnp.where(len_c > closest, 1.0,
                   jnp.exp(1.0 - closest / jnp.maximum(len_c, 1.0)))
    return jnp.where(len_c > 0, bp * jnp.exp(logp), 0.0)


def scst_reward(tables: RewardTables, video_idx: Array, tokens: Array,
                mask: Array, bleu_mix: float = 0.0) -> Array:
    r = cider_reward(tables, video_idx, tokens, mask)
    if bleu_mix > 0:
        r = (1.0 - bleu_mix) * r + bleu_mix * bleu4_reward(
            tables, video_idx, tokens, mask)
    return r
