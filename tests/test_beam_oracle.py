"""Randomized numpy-oracle parity for both beam-search semantics (SURVEY §4.2).

An INDEPENDENT numpy implementation of slot-blocking (`beam_decode`) and
finished-pool (`beam_decode_pool`) search. The oracle scores candidates over
the FULL K x V candidate matrix every step as plain python lists — no per-row
top-k shortcut, no flattened B*K batch trick, no fused logsumexp, no masked
fixed-shape pool — so it cannot share an implementation bug with the lax.scan
versions. The device results must match token-for-token (scores to 1e-5)
over random Markov LMs. Why full-matrix is a valid oracle for the per-row-
top-k implementations: each row contributes at most K winners to the global
top-K, so the union of per-row top-Ks (top-(K+1)s for the pool's alive set)
contains the global winners — the same containment argument documented at the
implementation site (models/decoding.py step()).

Fixed seeds keep the test deterministic. The toy LM is Markov PLUS a random
per-position bias: a purely Markov table makes exact score ties STRUCTURAL
(two paths visiting the same transition multiset in different orders sum to
the same logp — observed as tail-rank swaps at K=5), while the position bias
breaks the permutation symmetry so ties (the only way the two tie-break
orders could diverge) are measure-zero again.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vidcap_tpu.data.vocab import BOS, EOS, PAD
from vidcap_tpu.models.decoding import beam_decode, beam_decode_pool

V = 9          # vocab incl. specials; V - 1 >= K and K + 1 <= V for K <= 5
MAX_LEN = 7
NSEEDS = 5


def _np_logp(table, pos_bias):
    """log_softmax of table[prev] + pos_bias[t] → logp[t, prev, v]."""
    t = table.astype(np.float64)[None] + pos_bias.astype(np.float64)[:, None]
    t = t - t.max(-1, keepdims=True)
    return t - np.log(np.exp(t).sum(-1, keepdims=True))


def _factor(lp, length):
    return 1.0 if lp == 0.0 else ((5.0 + length) / 6.0) ** lp


def numpy_beam_slot(table, pos_bias, K, max_len, lp):
    """Slot-blocking reference: finished beams keep occupying a slot, offering
    one PAD continuation at zero cost."""
    logp = _np_logp(table, pos_bias)
    beams = [(0.0, [], BOS, False)]          # t=0: all K beams identical
    for t in range(max_len):
        cands = []
        for bi, (blp, _seq, prev, fin) in enumerate(beams):
            if fin:
                cands.append((blp, bi, PAD))
            else:
                for v in range(V):
                    cands.append((blp + logp[t, prev, v], bi, v))
        cands.sort(key=lambda c: -c[0])
        beams = [
            (clp, beams[bi][1] + [tok], tok, beams[bi][3] or tok == EOS)
            for clp, bi, tok in cands[:K]
        ]
    def norm(b):
        length = sum(1 for x in b[1] if x != PAD)
        return b[0] / _factor(lp, length)
    ranked = sorted(beams, key=norm, reverse=True)
    return [(b[1], norm(b)) for b in ranked]


def numpy_beam_pool(table, pos_bias, K, max_len, lp):
    """Finished-pool reference: an <eos> ranking within its row's top K+1
    moves the hypothesis to the pool (normalized at its finish length) and
    all K alive slots keep exploring non-<eos> continuations."""
    logp = _np_logp(table, pos_bias)
    alive = [(0.0, [], BOS)]
    pool = []                                 # (normalized score, seq)
    for t in range(max_len):
        cands = []
        for bi, (blp, seq, prev) in enumerate(alive):
            row = logp[t, prev]
            if int((row > row[EOS]).sum()) < K + 1:   # eos in row's top K+1
                pool.append(((blp + row[EOS]) / _factor(lp, t + 1),
                             seq + [EOS]))
            for v in range(V):
                if v != EOS:
                    cands.append((blp + row[v], bi, v))
        pool.sort(key=lambda c: -c[0])
        pool = pool[:K]
        cands.sort(key=lambda c: -c[0])
        alive = [(clp, alive[bi][1] + [v], v) for clp, bi, v in cands[:K]]
    merged = pool + [(blp / _factor(lp, max_len), seq)
                     for blp, seq, _ in alive]
    # stable sort keeps pool entries ahead of equal-scoring alive ones — the
    # same finished-wins-ties rule as the implementation's >= / concat order
    merged.sort(key=lambda c: -c[0])
    return [(seq, s) for s, seq in merged[:K]]


def _pad(seq, max_len):
    return np.asarray(seq + [PAD] * (max_len - len(seq)), np.int32)


def _batched_tables_step_fn(tables, pos_bias):
    """Per-video toy LMs: logits = tables[batch_id, prev_tok] + pos_bias[t].
    State packs (batch_id * 64 + t) per flat [B*K] row — beam pruning only
    reorders rows WITHIN a video's K-block and every row shares t, so the
    generic state gather keeps both fields correct."""
    tb = jnp.asarray(tables, jnp.float32)
    pb = jnp.asarray(pos_bias, jnp.float32)

    def step_fn(state, tok):
        sid = state.astype(jnp.int32)
        logits = tb[sid // 64, tok] + pb[jnp.minimum(sid % 64, MAX_LEN - 1)]
        return state + 1.0, logits

    return step_fn


def _init_state(K):
    return jnp.repeat(jnp.arange(NSEEDS, dtype=jnp.float32) * 64.0, K)


@pytest.mark.parametrize("lp", [0.0, 1.0])
@pytest.mark.parametrize("K", [2, 3, 5])
def test_slot_blocking_matches_numpy_oracle(K, lp):
    rng = np.random.default_rng(1234)
    tables = rng.normal(size=(NSEEDS, V, V)).astype(np.float32)
    pos_bias = rng.normal(size=(MAX_LEN, V)).astype(np.float32)
    step_fn = _batched_tables_step_fn(tables, pos_bias)
    toks, scores = beam_decode(
        step_fn, _init_state(K), batch=NSEEDS,
        max_len=MAX_LEN, beam_width=K, length_penalty=lp)
    toks, scores = np.asarray(toks), np.asarray(scores)
    # n-best surface: ALL K hypotheses, best-first
    toks_all, scores_all = beam_decode(
        step_fn, _init_state(K), batch=NSEEDS,
        max_len=MAX_LEN, beam_width=K, length_penalty=lp, return_all=True)
    toks_all, scores_all = np.asarray(toks_all), np.asarray(scores_all)
    for b in range(NSEEDS):
        ranked = numpy_beam_slot(tables[b], pos_bias, K, MAX_LEN, lp)
        np.testing.assert_array_equal(
            toks[b], _pad(ranked[0][0], MAX_LEN),
            err_msg=f"seed {b} K={K} lp={lp}")
        np.testing.assert_allclose(scores[b], ranked[0][1],
                                   rtol=1e-5, atol=1e-5)
        for n, (ref_seq, ref_score) in enumerate(ranked):
            np.testing.assert_array_equal(
                toks_all[b, n], _pad(ref_seq, MAX_LEN),
                err_msg=f"seed {b} K={K} lp={lp} rank {n}")
            np.testing.assert_allclose(scores_all[b, n], ref_score,
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("lp", [0.0, 1.0])
@pytest.mark.parametrize("K", [2, 3, 5])
def test_finished_pool_matches_numpy_oracle(K, lp):
    rng = np.random.default_rng(4321)
    # bias <eos> up so pool admission actually fires on most seeds (with pure
    # random normals most rows keep eos out of the top K+1 and the test would
    # mostly exercise the alive path)
    tables = rng.normal(size=(NSEEDS, V, V)).astype(np.float32)
    tables[..., EOS] += 1.0
    pos_bias = rng.normal(size=(MAX_LEN, V)).astype(np.float32)
    step_fn = _batched_tables_step_fn(tables, pos_bias)
    toks, scores = beam_decode_pool(
        step_fn, _init_state(K), batch=NSEEDS,
        max_len=MAX_LEN, beam_width=K, length_penalty=lp)
    toks, scores = np.asarray(toks), np.asarray(scores)
    toks_all, scores_all = beam_decode_pool(
        step_fn, _init_state(K), batch=NSEEDS,
        max_len=MAX_LEN, beam_width=K, length_penalty=lp, return_all=True)
    toks_all, scores_all = np.asarray(toks_all), np.asarray(scores_all)
    n_finished = 0
    for b in range(NSEEDS):
        ranked = numpy_beam_pool(tables[b], pos_bias, K, MAX_LEN, lp)
        n_finished += EOS in ranked[0][0]
        np.testing.assert_array_equal(
            toks[b], _pad(ranked[0][0], MAX_LEN),
            err_msg=f"seed {b} K={K} lp={lp}")
        np.testing.assert_allclose(scores[b], ranked[0][1],
                                   rtol=1e-5, atol=1e-5)
        for n, (ref_seq, ref_score) in enumerate(ranked):
            np.testing.assert_array_equal(
                toks_all[b, n], _pad(ref_seq, MAX_LEN),
                err_msg=f"seed {b} K={K} lp={lp} rank {n}")
            np.testing.assert_allclose(scores_all[b, n], ref_score,
                                       rtol=1e-5, atol=1e-5)
    assert n_finished >= 2, "fixture too easy: pool path barely exercised"
