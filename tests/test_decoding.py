"""Decode-strategy unit tests (SURVEY.md §4.2): greedy semantics, sampling,
beam search on a hand-built toy LM with a known optimal beam."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu.data.vocab import BOS, EOS, PAD
from vidcap_tpu.models.decoding import (beam_decode, greedy_decode,
                                        sample_decode, tile_state)
from vidcap_tpu.models.model import VidCapModel, create_model, init_params


@pytest.fixture(scope="module")
def bound_model(tiny_cfg):
    model = create_model(tiny_cfg, vocab_size=100)
    params = init_params(model, tiny_cfg, jax.random.key(1))

    def step_fn(state, tok):
        return model.apply({"params": params}, state, tok,
                           method=VidCapModel.step)

    def make_state(feats):
        return model.apply({"params": params}, feats,
                           method=VidCapModel.init_state)

    return step_fn, make_state, tiny_cfg


def test_greedy_matches_manual(bound_model):
    step_fn, make_state, cfg = bound_model
    B, T, D = 3, cfg.data.num_frames, cfg.data.feature_dim
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, D)),
                        jnp.float32)
    roll = greedy_decode(step_fn, make_state(feats), B, max_len=8)
    assert roll.tokens.shape == (B, 8)

    # manual argmax stepping must agree token-for-token
    state = make_state(feats)
    tok = jnp.full((B,), BOS, jnp.int32)
    finished = np.zeros(B, bool)
    for t in range(8):
        state, logits = step_fn(state, tok)
        nxt = np.asarray(jnp.argmax(logits, -1))
        nxt = np.where(finished, PAD, nxt)
        np.testing.assert_array_equal(np.asarray(roll.tokens[:, t]), nxt)
        finished |= nxt == EOS
        tok = jnp.asarray(nxt, jnp.int32)


def test_rollout_mask_semantics(bound_model):
    step_fn, make_state, cfg = bound_model
    B = 4
    feats = jnp.asarray(np.random.default_rng(1).normal(
        size=(B, cfg.data.num_frames, cfg.data.feature_dim)), jnp.float32)
    roll = greedy_decode(step_fn, make_state(feats), B, max_len=10)
    toks, mask = np.asarray(roll.tokens), np.asarray(roll.mask)
    for b in range(B):
        eos_pos = np.where(toks[b] == EOS)[0]
        if len(eos_pos):
            e = eos_pos[0]
            assert mask[b, : e + 1].all()          # real tokens incl. <eos>
            assert not mask[b, e + 1:].any()       # nothing after
            assert (toks[b, e + 1:] == PAD).all()
        else:
            assert mask[b].all()


def test_sample_decode_stochastic_but_valid(bound_model):
    step_fn, make_state, cfg = bound_model
    B = 4
    feats = jnp.zeros((B, cfg.data.num_frames, cfg.data.feature_dim))
    r1 = sample_decode(step_fn, make_state(feats), B, 10, jax.random.key(0))
    r2 = sample_decode(step_fn, make_state(feats), B, 10, jax.random.key(7))
    assert (np.asarray(r1.tokens) != np.asarray(r2.tokens)).any()
    # logp of emitted tokens must be finite negatives where mask=1
    lp, m = np.asarray(r1.logp), np.asarray(r1.mask)
    assert np.isfinite(lp).all()
    assert (lp[m > 0] <= 0).all()
    assert (lp[m == 0] == 0).all()


# ---------------------------------------------------------------- toy-LM beam

def _toy_step_fn(trans_logits):
    """A 2-step toy LM: logits depend only on the previous token (Markov)."""

    def step_fn(state, tok):
        return state + 1, trans_logits[tok]

    return step_fn


def test_beam_finds_higher_prob_than_greedy():
    """Classic beam case: greedy takes a locally-best first token that leads to a
    low-probability continuation; width-2 beam recovers the global optimum."""
    V = 5
    logits = np.full((V, V), -10.0, np.float32)
    # from BOS(1): token 3 slightly better than token 4
    logits[BOS, 3] = 2.0
    logits[BOS, 4] = 1.9
    # after 3: everything bad except EOS at -5 → total ≈ 2.0 + low
    logits[3, EOS] = -3.0
    logits[3, 4] = -3.1
    # after 4: EOS is great → total ≈ 1.9 + 5.0
    logits[4, EOS] = 5.0
    t = jnp.asarray(logits)

    step_fn = _toy_step_fn(t)
    greedy = greedy_decode(step_fn, jnp.zeros((1,)), 1, max_len=3)
    toks, scores = beam_decode(step_fn, jnp.zeros((2,)), batch=1, max_len=3,
                               beam_width=2)
    g = np.asarray(greedy.tokens)[0]
    b = np.asarray(toks)[0]
    assert g[0] == 3        # greedy takes the locally-best token
    assert b[0] == 4        # beam recovers the globally-best sequence
    assert b[1] == EOS


def test_beam_width1_equals_greedy(bound_model):
    step_fn, make_state, cfg = bound_model
    B = 3
    feats = jnp.asarray(np.random.default_rng(3).normal(
        size=(B, cfg.data.num_frames, cfg.data.feature_dim)), jnp.float32)
    greedy = greedy_decode(step_fn, make_state(feats), B, max_len=8)
    state = tile_state(make_state(feats), beam_width=1, batch=B)
    toks, _ = beam_decode(step_fn, state, batch=B, max_len=8, beam_width=1)
    np.testing.assert_array_equal(np.asarray(greedy.tokens), np.asarray(toks))


def test_beam_batch_independence():
    """Each batch row's beam must be independent of the others."""
    V = 5
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(V, V)).astype(np.float32)
    step_fn = _toy_step_fn(jnp.asarray(logits))
    t1, s1 = beam_decode(step_fn, jnp.zeros((2 * 2,)), batch=2, max_len=4,
                         beam_width=2)
    t2, s2 = beam_decode(step_fn, jnp.zeros((1 * 2,)), batch=1, max_len=4,
                         beam_width=2)
    np.testing.assert_array_equal(np.asarray(t1)[0], np.asarray(t2)[0])


def test_per_row_topk_iterative_matches_lax():
    from vidcap_tpu.models.decoding import per_row_topk_iterative
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(16, 300)), jnp.float32)
    rv, ri = jax.lax.top_k(x, 5)
    v, i = per_row_topk_iterative(x, 5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_beam_iterative_topk_same_result(tiny_cfg):
    from vidcap_tpu.models.model import create_model, init_params, VidCapModel
    from vidcap_tpu.models.decoding import tile_recurrent
    model = create_model(tiny_cfg, vocab_size=100)
    params = init_params(model, tiny_cfg, jax.random.key(9))
    B, K = 4, 3
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.normal(size=(B, tiny_cfg.data.num_frames,
                                         tiny_cfg.data.feature_dim)),
                        jnp.float32)
    state = model.apply({"params": params}, feats,
                        method=VidCapModel.init_state)

    def bs(st, tok):
        return model.apply({"params": params}, st, tok, K,
                           method=VidCapModel.step_beam)

    t1, s1 = beam_decode(bs, tile_recurrent(state, K), batch=B, max_len=7,
                         beam_width=K, topk_impl="lax")
    t2, s2 = beam_decode(bs, tile_recurrent(state, K), batch=B, max_len=7,
                         beam_width=K, topk_impl="iterative")
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_beam_early_exit_matches_scan(bound_model, tiny_cfg):
    """while_loop early-exit beam ≡ static-scan beam (tokens and scores), on a
    real model AND on a toy LM where every beam finishes at step 2 of 8."""
    from vidcap_tpu.models.decoding import tile_recurrent
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params
    model = create_model(tiny_cfg, vocab_size=100)
    params = init_params(model, tiny_cfg, jax.random.key(3))
    B, K = 4, 5
    feats = jnp.asarray(np.random.default_rng(5).normal(
        size=(B, tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim)),
        jnp.float32)
    state = tile_recurrent(model.apply({"params": params}, feats,
                                       method=VidCapModel.init_state), K)

    def beam_step(st, tok):
        return model.apply({"params": params}, st, tok, K,
                           method=VidCapModel.step_beam)

    t_scan, s_scan = beam_decode(beam_step, state, batch=B, max_len=10,
                                 beam_width=K)
    t_ee, s_ee = beam_decode(beam_step, state, batch=B, max_len=10,
                             beam_width=K, early_exit=True)
    np.testing.assert_array_equal(np.asarray(t_scan), np.asarray(t_ee))
    np.testing.assert_array_equal(np.asarray(s_scan), np.asarray(s_ee))

    # toy LM: every continuation hits EOS at step 2 → the while_loop exits at
    # t=2 while the scan runs all 8 steps; results must still be identical
    V = 6
    logits = np.full((V, V), -4.0, np.float32)
    logits[BOS, 4] = 1.0
    logits[BOS, 5] = 0.5
    logits[4, EOS] = 2.0
    logits[5, EOS] = 1.0
    step_fn = _toy_step_fn(jnp.asarray(logits))
    t1, s1 = beam_decode(step_fn, jnp.zeros((2,)), batch=1, max_len=8,
                         beam_width=2)
    t2, s2 = beam_decode(step_fn, jnp.zeros((2,)), batch=1, max_len=8,
                         beam_width=2, early_exit=True)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_tokens_only_bf16_greedy_matches(bound_model, tiny_cfg):
    """Serving config (bf16 logits + with_logp=False) must emit the SAME
    tokens/mask as the f32+logp rollout — argmax is exact on the bf16-rounded
    Dense output."""
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params
    model = create_model(tiny_cfg, vocab_size=100)
    params = init_params(model, tiny_cfg, jax.random.key(1))
    B = 4
    feats = jnp.asarray(np.random.default_rng(9).normal(
        size=(B, tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim)),
        jnp.float32)
    state = model.apply({"params": params}, feats,
                        method=VidCapModel.init_state)

    def mk_step(bf16):
        def step(st, tok):
            return model.apply({"params": params}, st, tok, bf16,
                               method=VidCapModel.step)
        return step

    full = greedy_decode(mk_step(False), state, B, max_len=10)
    lean = greedy_decode(mk_step(True), state, B, max_len=10,
                         with_logp=False)
    np.testing.assert_array_equal(np.asarray(full.tokens),
                                  np.asarray(lean.tokens))
    np.testing.assert_array_equal(np.asarray(full.mask),
                                  np.asarray(lean.mask))
    assert not np.asarray(lean.logp).any()


def test_early_exit_matches_scan(bound_model):
    """while_loop early-exit rollout ≡ the static scan rollout, token-for-token."""
    step_fn, make_state, cfg = bound_model
    B = 4
    feats = jnp.asarray(np.random.default_rng(12).normal(
        size=(B, cfg.data.num_frames, cfg.data.feature_dim)), jnp.float32)
    scan_roll = greedy_decode(step_fn, make_state(feats), B, max_len=10)
    ee_roll = greedy_decode(step_fn, make_state(feats), B, max_len=10,
                            early_exit=True)
    np.testing.assert_array_equal(np.asarray(scan_roll.tokens),
                                  np.asarray(ee_roll.tokens))
    np.testing.assert_array_equal(np.asarray(scan_roll.mask),
                                  np.asarray(ee_roll.mask))
    np.testing.assert_allclose(np.asarray(scan_roll.logp),
                               np.asarray(ee_roll.logp), rtol=1e-6)


# ------------------------------------------------- finished-pool beam semantics

def test_finished_pool_beats_slot_blocking_adversarial():
    """VERDICT r1 next #4: a case where the slot-blocking beam provably returns
    a WORSE sequence than the true finished-pool beam.

    With length_penalty=0 the two agree on the winning score (a pruned prefix
    scores below the finished beam that outranked it, and extensions only add
    logp ≤ 0) — divergence needs a positive length penalty, where a longer,
    slightly-worse-raw sequence normalizes better than a short finished one.

    Toy Markov LM (logits rows ARE log-probs; junk token absorbs leftover mass
    so each row sums to 1): both children of <bos> finish immediately with raw
    ≈ -1.30 (len 2), filling BOTH slot-blocking slots at t=1 and pruning the
    live prefix "a b" (raw -1.35). Its completion "a b <eos>" (raw -1.40,
    len 3) normalizes to -1.05 under lp=1 — better than the finished -1.114.
    """
    from vidcap_tpu.models.decoding import beam_decode_pool

    rows, A_TOK, B_TOK = _adversarial_rows()
    step_fn = _toy_step_fn(jnp.asarray(rows))
    slot_toks, slot_scores = beam_decode(
        step_fn, jnp.zeros((2,)), batch=1, max_len=3, beam_width=2, length_penalty=1.0)
    pool_toks, pool_scores = beam_decode_pool(
        step_fn, jnp.zeros((2,)), batch=1, max_len=3, beam_width=2, length_penalty=1.0)

    # slot-blocking: both slots finish at t=1 with the short captions
    st = np.asarray(slot_toks)[0]
    assert st[1] == EOS and st[0] in (A_TOK, B_TOK)
    np.testing.assert_allclose(float(slot_scores[0]), -1.30 * 6 / 7, rtol=1e-5)

    # finished pool keeps exploring and surfaces the better long caption
    np.testing.assert_array_equal(np.asarray(pool_toks)[0],
                                  [A_TOK, B_TOK, EOS])
    np.testing.assert_allclose(float(pool_scores[0]), -1.40 * 6 / 8, rtol=1e-5)
    assert float(pool_scores[0]) > float(slot_scores[0])


def test_finished_pool_matches_slot_blocking_lp0(bound_model):
    """With length_penalty=0 the pool and slot-blocking winners carry the SAME
    score on real models (see adversarial test docstring for the argument)."""
    from vidcap_tpu.models.decoding import beam_decode_pool, tile_state

    step_fn, make_state, cfg = bound_model
    B, T, D = 4, cfg.data.num_frames, cfg.data.feature_dim
    feats = jnp.asarray(np.random.default_rng(3).normal(size=(B, T, D)),
                        jnp.float32)
    K = 3
    st = tile_state(make_state(feats), K, B)
    toks_a, sc_a = beam_decode(step_fn, st, batch=B, max_len=10,
                               beam_width=K)
    st = tile_state(make_state(feats), K, B)
    toks_b, sc_b = beam_decode_pool(step_fn, st, batch=B, max_len=10,
                                    beam_width=K)
    np.testing.assert_allclose(np.asarray(sc_a), np.asarray(sc_b), atol=1e-4)


def test_finished_pool_early_exit_parity(bound_model):
    """early_exit=True must leave the pool winner identical to the full scan."""
    from vidcap_tpu.models.decoding import beam_decode_pool, tile_state

    step_fn, make_state, cfg = bound_model
    B = 3
    feats = jnp.asarray(np.random.default_rng(11).normal(
        size=(B, cfg.data.num_frames, cfg.data.feature_dim)), jnp.float32)
    K = 3
    st = tile_state(make_state(feats), K, B)
    toks_a, sc_a = beam_decode_pool(step_fn, st, batch=B, max_len=12,
                                    beam_width=K)
    st = tile_state(make_state(feats), K, B)
    toks_b, sc_b = beam_decode_pool(step_fn, st, batch=B, max_len=12,
                                    beam_width=K, early_exit=True)
    np.testing.assert_allclose(np.asarray(sc_a), np.asarray(sc_b), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))


def _adversarial_rows():
    """The Markov LM from test_finished_pool_beats_slot_blocking_adversarial."""
    V = 7
    A_TOK, B_TOK, JUNK = 4, 5, 6
    NEG = -1e9
    rows = np.full((V, V), NEG, np.float32)
    rows[BOS, A_TOK] = -0.6
    rows[BOS, B_TOK] = -1.25
    rows[BOS, JUNK] = np.log(1.0 - np.exp(-0.6) - np.exp(-1.25))
    rows[A_TOK, EOS] = -0.7
    rows[A_TOK, B_TOK] = -0.75
    rows[A_TOK, JUNK] = np.log(1.0 - np.exp(-0.7) - np.exp(-0.75))
    rows[B_TOK, EOS] = -0.05
    rows[B_TOK, A_TOK] = -5.0
    rows[B_TOK, JUNK] = np.log(1.0 - np.exp(-0.05) - np.exp(-5.0))
    rows[JUNK, JUNK] = 0.0
    return rows, A_TOK, B_TOK


def test_finished_pool_early_exit_parity_with_length_penalty():
    """Review r2 finding 1 regression: under length_penalty>0 the early-exit
    bound must use the MAX length factor (raw logp ≤ 0 → larger factor is more
    favourable); the inverted bound stopped the loop before the winning long
    caption could finish."""
    from vidcap_tpu.models.decoding import beam_decode_pool

    rows, A_TOK, B_TOK = _adversarial_rows()
    step_fn = _toy_step_fn(jnp.asarray(rows))
    toks_scan, sc_scan = beam_decode_pool(
        step_fn, jnp.zeros((2,)), batch=1, max_len=3, beam_width=2, length_penalty=1.0)
    toks_ee, sc_ee = beam_decode_pool(
        step_fn, jnp.zeros((2,)), batch=1, max_len=3, beam_width=2, length_penalty=1.0, early_exit=True)
    np.testing.assert_array_equal(np.asarray(toks_scan)[0],
                                  [A_TOK, B_TOK, EOS])
    np.testing.assert_array_equal(np.asarray(toks_scan), np.asarray(toks_ee))
    np.testing.assert_allclose(float(sc_scan[0]), float(sc_ee[0]), rtol=1e-6)


def test_finished_pool_prunes_low_ranked_eos():
    """Deliberate finish-rule semantics (review r2 finding 4, resolved the
    other way): a beam finishes ONLY when <eos> ranks in its row's top K+1 —
    a superset of im2txt's top-K rule. An unpruned pool that finishes every
    beam on the raw <eos> column every step degenerates: the one-term
    immediate-<eos> score beats any real multi-token caption under log-prob
    scoring. Here <eos> ranks 3rd (outside top-2 with K=1), so the pool must
    stay empty and the decoder must emit a real caption."""
    from vidcap_tpu.models.decoding import beam_decode_pool

    V = 7
    A_TOK, B_TOK, JUNK = 4, 5, 6
    NEG = -1e9
    rows = np.full((V, V), NEG, np.float32)
    # probabilities sum < 1 so the junk-absorption log stays real (an earlier
    # version fed log() a negative remainder → NaN poisoning the top-k)
    rows[BOS, A_TOK] = -0.9
    rows[BOS, B_TOK] = -1.3
    rows[BOS, EOS] = -1.7          # 3rd in the row: outside top-(K+1)=top-2
    rows[BOS, JUNK] = np.log(
        1.0 - np.exp(-0.9) - np.exp(-1.3) - np.exp(-1.7))
    assert np.isfinite(rows[BOS, JUNK]), "toy LM row must stay a distribution"
    for t in (A_TOK, B_TOK, JUNK):
        rows[t, A_TOK] = -1.0      # real continuations exist
        rows[t, JUNK] = -1.2

    step_fn = _toy_step_fn(jnp.asarray(rows))
    toks, scores = beam_decode_pool(
        step_fn, jnp.zeros((1,)), batch=1, max_len=3, beam_width=1, length_penalty=1.0)
    out = np.asarray(toks)[0]
    assert out[0] != EOS, out      # no degenerate immediate-<eos> caption


def test_per_row_topk_variants_agree():
    """All exact top-k strategies (iterative, rescan, hierarchic, lane) must
    agree with lax.top_k on values — and on indices up to tie order (forced
    ties included; lane's union ordering may break ties differently)."""
    from vidcap_tpu.models.decoding import (per_row_topk_hierarchic,
                                            per_row_topk_iterative,
                                            per_row_topk_lane,
                                            per_row_topk_rescan)

    rng = np.random.default_rng(21)
    for trial in range(4):
        x = rng.normal(size=(32, 1280)).astype(np.float32)
        if trial >= 2:
            x = np.round(x * 4) / 4          # force ties
        x = jnp.asarray(x)
        vref, iref = jax.lax.top_k(x, 5)
        for fn, exact_idx in ((per_row_topk_iterative, True),
                              (per_row_topk_rescan, True),
                              (per_row_topk_hierarchic, True),
                              (per_row_topk_lane, False)):
            v, i = fn(x, 5)
            np.testing.assert_array_equal(np.asarray(v), np.asarray(vref),
                                          err_msg=fn.__name__)
            if exact_idx:
                np.testing.assert_array_equal(np.asarray(i), np.asarray(iref),
                                              err_msg=fn.__name__)
            else:
                # values at the returned indices must equal the top values
                got = np.take_along_axis(np.asarray(x), np.asarray(i), -1)
                np.testing.assert_array_equal(got, np.asarray(vref),
                                              err_msg=fn.__name__)


def test_state_duplication_layers_equal_batch():
    """Review r2 regression: with num_lstm_layers == batch_size the generic
    shape heuristic concatenated h/c on the LAYER axis; DecoderState must be
    handled explicitly in duplicate_state and tile_state."""
    from vidcap_tpu.models.decoder import DecoderState
    from vidcap_tpu.models.decoding import duplicate_state, tile_state

    L = B = 2
    H, T, A = 4, 3, 6
    st = DecoderState(h=jnp.zeros((L, B, H)), c=jnp.zeros((L, B, H)),
                      keys=jnp.zeros((B, T, A)), values=jnp.zeros((B, T, H)),
                      frame_mask=jnp.ones((B, T)))
    d = duplicate_state(st, B)
    assert d.h.shape == (L, 2 * B, H), d.h.shape
    assert d.keys.shape == (2 * B, T, A)
    t = tile_state(st, 3, B)
    assert t.h.shape == (L, 3 * B, H), t.h.shape
    assert t.values.shape == (3 * B, T, H)
