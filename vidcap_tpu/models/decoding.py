"""On-device decode strategies: greedy, multinomial sampling, beam (SURVEY.md C9–C11).

All three run entirely on-device as a single ``lax.scan`` with a static trip count
(max_len) — one compiled call per video batch, never one host round-trip per token
(the reference's beam loop calls ``sess.run`` per token, SURVEY.md §3.3). A static-
length scan with a finished mask beats ``lax.while_loop`` on TPU here: the trip count
is tiny (≤30), shapes stay static, and XLA can pipeline the steps.

Greedy doubles as the SCST baseline rollout and multinomial as the SCST sample rollout
(BASELINE.json configs[4]); both return per-token log-probs so the PG loss needs no
second forward pass.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from vidcap_tpu.data.vocab import BOS, EOS, PAD

Array = jax.Array


@dataclasses.dataclass
class Rollout:
    """tokens i32[B, L]; logp f32[B, L] (log-prob of emitted token, 0 after finish);
    mask f32[B, L] (1.0 for real tokens incl. the first <eos>)."""

    tokens: Array
    logp: Array
    mask: Array


jax.tree_util.register_pytree_node(
    Rollout,
    lambda r: ((r.tokens, r.logp, r.mask), None),
    lambda _, ch: Rollout(*ch),
)


def _rollout(step_fn, state, batch: int, max_len: int,
             select_fn) -> Rollout:
    """Shared greedy/sample scaffold. select_fn(logits, key) → (token, logp)."""

    def body(carry, key):
        st, prev_tok, finished = carry
        st, logits = step_fn(st, prev_tok)
        tok, logp = select_fn(logits, key)
        tok = jnp.where(finished, PAD, tok)
        logp = jnp.where(finished, 0.0, logp)
        mask = 1.0 - finished.astype(jnp.float32)
        new_finished = finished | (tok == EOS)
        return (st, tok, new_finished), (tok, logp, mask)

    keys = jax.random.split(jax.random.key(0), max_len)  # unused for greedy
    init = (state, jnp.full((batch,), BOS, jnp.int32),
            jnp.zeros((batch,), bool))
    _, (toks, logps, masks) = jax.lax.scan(body, init, keys)
    return Rollout(tokens=toks.T, logp=logps.T, mask=masks.T)


def greedy_decode(step_fn, state, batch: int, max_len: int,
                  early_exit: bool = False, with_logp: bool = True) -> Rollout:
    """Argmax rollout to <eos>/max_len (SURVEY.md C9); SCST baseline path.

    early_exit=True uses ``lax.while_loop`` and stops the moment every row has
    emitted <eos> — for a converged captioner (mean length ~10 ≪ max_len 30)
    that's ~3× fewer decode steps. Training rollouts keep the static scan
    (fixed cost, better pipelining); serving can opt in.

    with_logp=False skips the per-step log_softmax (a full [B, V] exp/log
    sweep) and returns zeros in ``logp`` — the SCST baseline only consumes
    tokens + mask, never the baseline's log-probs."""

    def select(logits, key):
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if not with_logp:
            return tok, jnp.zeros(tok.shape, jnp.float32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return tok, jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0]

    if early_exit:
        return _rollout_while(step_fn, state, batch, max_len, select)
    return _rollout(step_fn, state, batch, max_len, select)


def _rollout_while(step_fn, state, batch: int, max_len: int,
                   select_fn) -> Rollout:
    """Early-exit rollout: identical semantics to :func:`_rollout`, but the
    loop ends as soon as all rows are finished (all-finished ``psum`` check)."""
    toks0 = jnp.zeros((batch, max_len), jnp.int32)
    logp0 = jnp.zeros((batch, max_len), jnp.float32)
    mask0 = jnp.zeros((batch, max_len), jnp.float32)

    def cond(carry):
        t, _, _, finished, _, _, _ = carry
        return (t < max_len) & ~finished.all()

    def body(carry):
        t, st, prev_tok, finished, toks, logps, masks = carry
        st, logits = step_fn(st, prev_tok)
        tok, logp = select_fn(logits, None)
        tok = jnp.where(finished, PAD, tok)
        logp = jnp.where(finished, 0.0, logp)
        step_mask = 1.0 - finished.astype(jnp.float32)
        toks = toks.at[:, t].set(tok)
        logps = logps.at[:, t].set(logp)
        masks = masks.at[:, t].set(step_mask)
        return (t + 1, st, tok, finished | (tok == EOS), toks, logps, masks)

    init = (jnp.int32(0), state, jnp.full((batch,), BOS, jnp.int32),
            jnp.zeros((batch,), bool), toks0, logp0, mask0)
    _, _, _, _, toks, logps, masks = jax.lax.while_loop(cond, body, init)
    return Rollout(tokens=toks, logp=logps, mask=masks)


def sample_decode(step_fn, state, batch: int, max_len: int, rng: Array,
                  temperature: float = 1.0) -> Rollout:
    """Multinomial rollout via ``jax.random.categorical`` (SURVEY.md C10);
    SCST sample path."""

    def body(carry, key):
        st, prev_tok, finished = carry
        st, logits = step_fn(st, prev_tok)
        scaled = logits / jnp.maximum(temperature, 1e-6)
        tok = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
        logp_all = jax.nn.log_softmax(scaled, axis=-1)
        logp = jnp.take_along_axis(logp_all, tok[:, None], axis=-1)[:, 0]
        tok = jnp.where(finished, PAD, tok)
        logp = jnp.where(finished, 0.0, logp)
        mask = 1.0 - finished.astype(jnp.float32)
        new_finished = finished | (tok == EOS)
        return (st, tok, new_finished), (tok, logp, mask)

    keys = jax.random.split(rng, max_len)
    init = (state, jnp.full((batch,), BOS, jnp.int32),
            jnp.zeros((batch,), bool))
    _, (toks, logps, masks) = jax.lax.scan(body, init, keys)
    return Rollout(tokens=toks.T, logp=logps.T, mask=masks.T)


def duplicate_state(state, batch: int):
    """[greedy-block; sample-block] duplication of a decode state: every leaf's
    B batch rows become 2B rows (block layout, NOT interleaved — callers slice
    ``[:B]``/``[B:]``). DecoderState is handled explicitly (h/c carry a
    leading LAYERS axis — a shape heuristic mis-fires when
    num_lstm_layers == batch_size, review r2)."""
    from vidcap_tpu.models.decoder import DecoderState

    if isinstance(state, DecoderState):
        return DecoderState(
            h=jnp.concatenate([state.h, state.h], axis=1),
            c=jnp.concatenate([state.c, state.c], axis=1),
            keys=jnp.concatenate([state.keys, state.keys], axis=0),
            values=jnp.concatenate([state.values, state.values], axis=0),
            frame_mask=jnp.concatenate([state.frame_mask, state.frame_mask],
                                       axis=0))

    def dup(x):
        if x.ndim >= 2 and x.shape[0] != batch and x.shape[1] == batch:
            return jnp.concatenate([x, x], axis=1)
        return jnp.concatenate([x, x], axis=0)

    return jax.tree_util.tree_map(dup, state)


def dual_rollout(step_fn, state2, batch: int, max_len: int, rng: Array,
                 temperature: float = 1.0) -> Tuple[Rollout, Rollout]:
    """ONE forward-only scan driving BOTH SCST rollouts (SURVEY.md §3.2):
    rows [0:B] run the greedy baseline (argmax), rows [B:2B] the multinomial
    policy sample — the decoder step is latency-bound at these widths (see
    ARCHITECTURE.md beam profile), so one 2B-row scan costs ~one B-row scan
    and halves the rollout's sequential step count vs two separate scans.

    ``state2`` must already have 2B rows (:func:`duplicate_state`). Returns
    (greedy, sample) Rollouts with tokens/mask only — ``logp`` is ZERO; the
    caller re-scores the sampled tokens teacher-forced for the PG gradient
    (identical gradients: the recurrence is the same function of params once
    the tokens are fixed — the Pallas SCST path's trick, train/scst.py)."""
    B = batch

    def body(carry, key):
        st, prev_tok, finished = carry
        st, logits = step_fn(st, prev_tok)              # [2B, V] (bf16 ok)
        g_tok = jnp.argmax(logits[:B], axis=-1).astype(jnp.int32)
        scaled = (logits[B:].astype(jnp.float32)
                  / jnp.maximum(temperature, 1e-6))
        s_tok = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
        tok = jnp.concatenate([g_tok, s_tok])
        tok = jnp.where(finished, PAD, tok)
        mask = 1.0 - finished.astype(jnp.float32)
        return (st, tok, finished | (tok == EOS)), (tok, mask)

    keys = jax.random.split(rng, max_len)
    init = (state2, jnp.full((2 * B,), BOS, jnp.int32),
            jnp.zeros((2 * B,), bool))
    _, (toks, masks) = jax.lax.scan(body, init, keys)
    toks, masks = toks.T, masks.T                       # [2B, L]
    zero_lp = jnp.zeros((B, max_len), jnp.float32)
    return (Rollout(tokens=toks[:B], logp=zero_lp, mask=masks[:B]),
            Rollout(tokens=toks[B:], logp=zero_lp, mask=masks[B:]))


# --------------------------------------------------------------------------- beam

def per_row_topk_iterative(x: Array, k: int) -> Tuple[Array, Array]:
    """Per-row top-k by k max-extract passes — elementwise/reduce ops only.
    ``lax.top_k`` over a wide vocab axis is the single most expensive op in the
    beam step on TPU; k sequential (max, argmax, mask) passes fuse into cheap
    VPU sweeps. Ties resolve to the smallest index, like lax.top_k."""
    V = x.shape[-1]
    col = jnp.arange(V)[None, :]
    cur = x
    vals, idxs = [], []
    for _ in range(k):
        m = cur.max(-1)
        a = cur.argmax(-1).astype(jnp.int32)
        vals.append(m)
        idxs.append(a)
        cur = jnp.where(col == a[:, None], -jnp.inf, cur)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def per_row_topk_rescan(x: Array, k: int) -> Tuple[Array, Array]:
    """Like :func:`per_row_topk_iterative` but pass k re-masks the ORIGINAL
    buffer with the k-1 previous argmaxes instead of carrying a masked copy —
    the where-chains fuse into each max/argmax reduction, so the [N, V] buffer
    is only ever READ (5 sweeps), never re-written (saves ~4 write sweeps)."""
    V = x.shape[-1]
    col = jnp.arange(V)[None, :]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    vals, idxs = [], []
    for _ in range(k):
        masked = x
        for a in idxs:
            masked = jnp.where(col == a[:, None], neg, masked)
        vals.append(masked.max(-1))
        idxs.append(masked.argmax(-1).astype(jnp.int32))
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def per_row_topk_hierarchic(x: Array, k: int, chunk: int = 128
                            ) -> Tuple[Array, Array]:
    """Exact per-row top-k in ~ONE full sweep of x instead of k.

    Split the V axis into 128-wide chunks, reduce each to its max (one full
    read), pick the top-k CHUNKS by max, and finish with an exact top-k inside
    the gathered k·chunk union. Exactness: every chunk whose max exceeds the
    row's k-th largest value must itself contain a top-k value (its max IS a
    row value larger than the k-th), and the top-k values occupy at most k
    distinct chunks — so the union of the k max-ranked chunks contains them
    all. The k passes now run over [N, C]=V/128 and [N, k·128] buffers (~3% of
    the full sweep each), cutting the dominant [B·K, V] HBM traffic of the
    beam step from k+1 sweeps to ~1 (see ARCHITECTURE.md §measured)."""
    N, V = x.shape
    assert V % chunk == 0, (V, chunk)
    C = V // chunk
    xc = x.reshape(N, C, chunk)
    cmax = xc.max(-1)                                   # [N, C] — THE sweep
    _, cidx = per_row_topk_iterative(cmax, k)           # [N, k] chunk ids
    # ascending chunk order so ties inside the union resolve to the smallest
    # GLOBAL index, matching lax.top_k / per_row_topk_iterative
    cidx = jnp.sort(cidx, axis=-1)
    sel = jnp.take_along_axis(xc, cidx[:, :, None], axis=1)   # [N, k, chunk]
    tv, ui = per_row_topk_iterative(sel.reshape(N, k * chunk), k)
    base = jnp.take_along_axis(cidx, ui // chunk, axis=-1) * chunk
    return tv, (base + ui % chunk).astype(jnp.int32)


def per_row_topk_lane(x: Array, k: int, lanes: int = 128
                      ) -> Tuple[Array, Array]:
    """Exact per-row top-k via a LANE-major reduction.

    Same containment argument as :func:`per_row_topk_hierarchic`, but the
    first reduction runs over the non-lane axis of [N, V/lanes, lanes]
    (element-wise register max on the VPU — no cross-lane shuffles): a lane
    whose column-max exceeds the row's k-th value must contain a top-k value,
    and the top-k values occupy at most k distinct lanes, so the k max-ranked
    lanes' columns contain them all."""
    N, V = x.shape
    assert V % lanes == 0, (V, lanes)
    C = V // lanes
    xc = x.reshape(N, C, lanes)
    lmax = xc.max(axis=1)                               # [N, lanes] cheap axis
    _, lidx = per_row_topk_iterative(lmax, k)           # [N, k] lane ids
    lidx = jnp.sort(lidx, axis=-1)
    sel = jnp.take_along_axis(
        xc, lidx[:, None, :], axis=2)                   # [N, C, k]
    tv, ui = per_row_topk_iterative(sel.reshape(N, C * k), k)
    # union index ui = row_in_column * k + lane_slot; global = row*lanes + lane
    lane = jnp.take_along_axis(lidx, ui % k, axis=-1)
    ti = (ui // k) * lanes + lane
    # union ordering is (column-row, lane) — not global order — so ties inside
    # the union can resolve to a larger global index than lax.top_k would;
    # exact values either way
    return tv, ti.astype(jnp.int32)


def _lp_factor(length_penalty: float, lengths) -> Array:
    """GNMT length-normalization factor ((5+len)/6)^lp; 1.0 when lp == 0."""
    lengths = jnp.asarray(lengths, jnp.float32)
    if length_penalty == 0.0:
        return jnp.ones_like(lengths)
    return ((5.0 + lengths) / 6.0) ** length_penalty


def _make_state_gather(B: int, K: int, recurrent_only_gather: bool):
    """Reorder the B·K 'batch' rows of the decode state after beam pruning.

    For DecoderState only the RECURRENT leaves (h, c) need the gather —
    keys/values/frame_mask are per-video tensors and beam reordering stays
    within a video's K-row block, so gathering them is an identity (and a
    ~2× HBM-traffic saving per step at B=128). Shared by beam_decode and
    beam_decode_pool."""
    from vidcap_tpu.models.decoder import DecoderState

    def gather_state(st, flat_src):
        if recurrent_only_gather and isinstance(st, DecoderState):
            return DecoderState(h=st.h[:, flat_src], c=st.c[:, flat_src],
                                keys=st.keys, values=st.values,
                                frame_mask=st.frame_mask)

        def gather_rows(x):
            if x.ndim >= 1 and x.shape[0] == B * K:
                return x[flat_src]
            if x.ndim >= 2 and x.shape[1] == B * K:   # h/c: [layers, B*K, H]
                return x[:, flat_src]
            return x

        return jax.tree_util.tree_map(gather_rows, st)

    return gather_state


def use_finished_pool(decode_cfg) -> bool:
    """The ONE place the finished_pool='auto' rule lives (Captioner and the
    sharded decode both call this — they must never diverge): the pool runs
    exactly when slot-blocking could return a different winner, i.e. under a
    nonzero length penalty (see ARCHITECTURE.md beam semantics)."""
    pool = decode_cfg.finished_pool
    return pool == "on" or (pool == "auto"
                            and decode_cfg.length_penalty != 0.0)


def beam_decode(step_fn, state, batch: int, max_len: int, beam_width: int,
                length_penalty: float = 0.0,
                recurrent_only_gather: bool = True,
                topk_impl: str = "iterative",
                early_exit: bool = False,
                unroll: int = 1,
                return_all: bool = False) -> Tuple[Array, Array]:
    """Batched beam search fully on-device (SURVEY.md C11, §3.3 "TPU build").

    The B×K beams are flattened into the batch dimension so every step is one
    decoder call on a [B*K] batch. State layout: the caller must pass ``state``
    already tiled to B*K rows (use :func:`tile_state`).

    early_exit=True runs the same step body under ``lax.while_loop`` and stops
    the moment every beam of every video is finished — finished beams only ever
    extend with <pad> at zero cost, so stopping early leaves alive_logp and
    alive_seq exactly as the full scan would (serving on a converged captioner
    finishes in ~a third of max_len). Throughput benchmarking keeps the static
    scan (fixed trip count, better pipelining).

    Returns (tokens i32[B, L] best beam, scores f32[B]); with
    ``return_all=True``: (tokens i32[B, K, L], scores f32[B, K]) sorted
    best-first — the n-best surface (`caption --nbest`).
    """
    K = beam_width   # the vocab width comes from the step_fn's logits alone
    B = batch
    NEG = -1e30

    def lp_norm(logp, lengths):
        return logp / _lp_factor(length_penalty, lengths)

    gather_state = _make_state_gather(B, K, recurrent_only_gather)

    def step(carry, t):
        st, prev_tok, alive_logp, alive_seq, finished = carry
        # st: decoder state with B*K rows; prev_tok: i32[B*K]
        st, logits = step_fn(st, prev_tok)                  # [B*K, V]

        # per-row top-K on RAW logits (log_softmax is monotone per row) + one
        # fused logsumexp — instead of materializing normalized [B·K, V] logp
        # and running top-K over K·V. The union of per-row top-Ks contains the
        # global top-K, so results are identical (up to tie order); per step
        # this saves ~2 HBM sweeps of the [B·K, V] buffer.
        # dtype-agnostic: when step_fn keeps logits in bf16 (the Dense output
        # dtype — the f32 upcast adds no information, see decoder._lstm_logits)
        # the five top-k sweeps touch half the bytes; lse still accumulates in
        # f32 (the cast fuses into the reduction) and results are bit-identical
        # because every bf16 value upcasts exactly.
        lse = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1)            # [B*K]
        if topk_impl == "iterative":
            tv, ti = per_row_topk_iterative(logits, K)      # [B*K, K]
        elif topk_impl == "rescan":
            tv, ti = per_row_topk_rescan(logits, K)
        elif topk_impl == "hierarchic":
            tv, ti = per_row_topk_hierarchic(logits, K)
        elif topk_impl == "lane":
            tv, ti = per_row_topk_lane(logits, K)
        elif topk_impl == "approx":
            # TPU PartialReduce top-k; recall_target=1.0 + aggregate keeps it
            # exact while avoiding lax.top_k's full sort
            tv, ti = jax.lax.approx_max_k(
                logits, K, recall_target=1.0, aggregate_to_topk=True)
            ti = ti.astype(jnp.int32)
        else:
            tv, ti = jax.lax.top_k(logits, K)               # [B*K, K]
        logp_k = (tv.astype(jnp.float32) - lse[:, None]).reshape(B, K, K)
        idx_k = ti.reshape(B, K, K).astype(jnp.int32)

        # finished beams: only candidate is PAD at zero cost
        fin = finished[:, :, None]
        first_slot = (jnp.arange(K) == 0)[None, None, :]
        logp_k = jnp.where(fin, jnp.where(first_slot, 0.0, NEG), logp_k)
        idx_k = jnp.where(fin, PAD, idx_k)

        cand = alive_logp[:, :, None] + logp_k              # [B, K, K]
        # at t=0 all beams are identical — keep only beam 0's candidates
        beam_mask = jnp.where(
            (t == 0) & (jnp.arange(K)[None, :, None] > 0), NEG, 0.0)
        cand = cand + beam_mask

        flat = cand.reshape(B, K * K)
        top_logp, top_idx = jax.lax.top_k(flat, K)          # [B, K]
        src_beam = top_idx // K                             # [B, K]
        src_pos = top_idx % K
        bidx = jnp.arange(B)[:, None]
        new_tok = idx_k[bidx, src_beam, src_pos]            # [B, K]

        # gather: sequences, finished flags, decoder state rows
        new_seq = alive_seq[bidx, src_beam]                 # [B, K, L]
        new_seq = new_seq.at[:, :, t].set(new_tok)
        was_finished = finished[bidx, src_beam]
        new_finished = was_finished | (new_tok == EOS)

        flat_src = (bidx * K + src_beam).reshape(B * K)     # rows into B*K state
        st = gather_state(st, flat_src)

        return (st, new_tok.reshape(B * K), top_logp, new_seq, new_finished), None

    alive_seq = jnp.zeros((B, K, max_len), jnp.int32)
    alive_logp = jnp.zeros((B, K), jnp.float32)
    finished = jnp.zeros((B, K), bool)
    prev_tok = jnp.full((B * K,), BOS, jnp.int32)
    carry = (state, prev_tok, alive_logp, alive_seq, finished)
    if early_exit:
        def cond(tc):
            t, c = tc
            return (t < max_len) & ~c[4].all()

        def body(tc):
            t, c = tc
            return t + 1, step(c, t)[0]

        _, (st, _, alive_logp, alive_seq, finished) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), carry))
    else:
        (st, _, alive_logp, alive_seq, finished), _ = jax.lax.scan(
            step, carry, jnp.arange(max_len), unroll=unroll)

    lengths = (alive_seq != PAD).astype(jnp.float32).sum(-1)
    scores = lp_norm(alive_logp, lengths)
    if return_all:
        # n-best: every beam slot, sorted best-first by normalized score
        order = jnp.argsort(-scores, axis=-1)               # [B, K]
        bidx = jnp.arange(B)[:, None]
        return alive_seq[bidx, order], scores[bidx, order]
    best = jnp.argmax(scores, axis=-1)                      # [B]
    bidx = jnp.arange(B)
    return alive_seq[bidx, best], scores[bidx, best]


def beam_decode_pool(step_fn, state, batch: int, max_len: int,
                     beam_width: int,
                     length_penalty: float = 0.0,
                     recurrent_only_gather: bool = True,
                     early_exit: bool = False,
                     return_all: bool = False) -> Tuple[Array, Array]:
    """Beam search with a TRUE finished pool (im2txt/tensor2tensor lineage).

    Differs from :func:`beam_decode` (slot-blocking): when a hypothesis emits
    <eos> it moves to a fixed-shape finished pool ([B, K] best-finished), and
    ALL K alive slots keep exploring live continuations — a finished beam never
    occupies an alive slot emitting PAD. Slot-blocking can prune an alive
    continuation that would ultimately score higher than a finished beam it
    keeps carrying (see tests/test_decoding.py adversarial toy-LM case); the
    classic sess.run-per-token beams this framework replaces (SURVEY.md §3.3)
    keep completed captions in a separate list exactly like this pool.

    Shapes stay static: the pool is a [B, K] score table + [B, K, L] token
    table, merged with the per-step <eos> candidates by one top_k.

    Finish rule (deliberate, review-examined): a beam finishes only when
    <eos> ranks within its row's top K+1 candidates — a SUPERSET of im2txt's
    rule (finish iff <eos> is in the row's top K words). Finishing
    unconditionally on the raw <eos> column is NOT an improvement: under
    log-prob scoring an immediate garbage-ranked <eos> (one short negative
    term) outscores every real multi-token caption, so an unpruned pool
    degenerates to near-empty captions
    (tests/test_decoding.py::test_finished_pool_prunes_low_ranked_eos).

    Returns (tokens i32[B, L] best overall, scores f32[B]); with
    ``return_all=True``: (tokens i32[B, K, L], scores f32[B, K]) — the K best
    of the merged pool∪alive candidates, sorted best-first.
    """
    K = beam_width   # the vocab width comes from the step_fn's logits alone
    B = batch
    NEG = -1e30

    def lp_factor(lengths):
        return _lp_factor(length_penalty, lengths)

    gather_state = _make_state_gather(B, K, recurrent_only_gather)

    def step(carry, t):
        st, prev_tok, alive_logp, alive_seq, fin_logp, fin_seq = carry
        st, logits = step_fn(st, prev_tok)                   # [B*K, V]

        lse = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1)             # [B*K]
        # top-(K+1) per row: even if a row's <eos> ranks in its top K+1, the
        # row still offers ≥ K live continuations to the alive competition
        tv, ti = per_row_topk_iterative(logits, K + 1)       # [B*K, K+1]
        logp_k = (tv.astype(jnp.float32) - lse[:, None]).reshape(B, K, K + 1)
        idx_k = ti.reshape(B, K, K + 1).astype(jnp.int32)

        cand = alive_logp[:, :, None] + logp_k               # [B, K, K+1]
        # at t=0 all beams are identical — keep only beam 0's candidates
        beam_mask = jnp.where(
            (t == 0) & (jnp.arange(K)[None, :, None] > 0), NEG, 0.0)
        cand = cand + beam_mask
        is_eos = idx_k == EOS

        # ---- finished pool: merge top-ranked <eos> candidates (normalized at
        # their finish length t+1) with the existing pool, keep the best K
        eos_scores = jnp.where(
            is_eos, cand / lp_factor(jnp.float32(t + 1)), NEG
        ).reshape(B, K * (K + 1))
        # candidate sequences: parent alive row + <eos> written at position t
        par_seq = jnp.broadcast_to(
            alive_seq[:, :, None, :], (B, K, K + 1, max_len)
        ).reshape(B, K * (K + 1), max_len)
        eos_seq = par_seq.at[:, :, t].set(EOS)
        pool_scores = jnp.concatenate([fin_logp, eos_scores], axis=1)
        pool_seq = jnp.concatenate([fin_seq, eos_seq], axis=1)
        new_fin_logp, fin_src = jax.lax.top_k(pool_scores, K)      # [B, K]
        new_fin_seq = jnp.take_along_axis(
            pool_seq, fin_src[:, :, None], axis=1)                 # [B, K, L]

        # ---- alive: best K NON-eos candidates keep exploring
        live = jnp.where(is_eos, NEG, cand).reshape(B, K * (K + 1))
        top_logp, top_idx = jax.lax.top_k(live, K)                 # [B, K]
        src_beam = top_idx // (K + 1)
        src_pos = top_idx % (K + 1)
        bidx = jnp.arange(B)[:, None]
        new_tok = idx_k[bidx, src_beam, src_pos]                   # [B, K]
        new_seq = alive_seq[bidx, src_beam]
        new_seq = new_seq.at[:, :, t].set(new_tok)

        flat_src = (bidx * K + src_beam).reshape(B * K)
        st = gather_state(st, flat_src)
        return (st, new_tok.reshape(B * K), top_logp, new_seq,
                new_fin_logp, new_fin_seq), None

    alive_seq = jnp.zeros((B, K, max_len), jnp.int32)
    alive_logp = jnp.zeros((B, K), jnp.float32)
    fin_logp = jnp.full((B, K), NEG, jnp.float32)
    fin_seq = jnp.zeros((B, K, max_len), jnp.int32)
    prev_tok = jnp.full((B * K,), BOS, jnp.int32)
    carry = (state, prev_tok, alive_logp, alive_seq, fin_logp, fin_seq)

    if early_exit:
        def cond(tc):
            t, c = tc
            alive_lp, fin_lp = c[2], c[4]
            # an alive beam's future raw logp only gets worse (adds ≤ 0), and
            # raw ≤ 0, so its best POSSIBLE normalized score raw/factor is
            # maximized by the LARGEST factor over any reachable finish length
            # (dividing a non-positive number by a bigger positive factor moves
            # it toward 0 — a round-2 review caught the inverted min() here).
            # Stop when even that bound can't displace the pool's K-th best.
            if length_penalty == 0.0:
                best_possible = alive_lp.max(-1)
            else:
                lens = jnp.arange(1, max_len + 1, dtype=jnp.float32)
                best_factor = jnp.max(lp_factor(lens))
                best_possible = alive_lp.max(-1) / best_factor
            pool_min = fin_lp.min(-1)
            return (t < max_len) & jnp.any(best_possible > pool_min)

        def body(tc):
            t, c = tc
            return t + 1, step(c, t)[0]

        _, (st, _, alive_logp, alive_seq, fin_logp, fin_seq) = \
            jax.lax.while_loop(cond, body, (jnp.int32(0), carry))
    else:
        (st, _, alive_logp, alive_seq, fin_logp, fin_seq), _ = jax.lax.scan(
            step, carry, jnp.arange(max_len))

    # best finished beats best alive-at-max_len (alive sequences have no <eos>;
    # normalize them at full length like the classic implementations do)
    alive_norm = alive_logp / lp_factor(jnp.float32(max_len))
    if return_all:
        # n-best: top K of the merged pool∪alive candidates. The pool block
        # comes FIRST in the concat so top_k's lower-index tie-break prefers
        # a finished caption on exact score ties — the same >= rule as the
        # best-1 path below; empty pool slots sit at NEG and never surface.
        all_scores = jnp.concatenate([fin_logp, alive_norm], axis=1)  # [B,2K]
        all_seq = jnp.concatenate([fin_seq, alive_seq], axis=1)   # [B,2K,L]
        top, idx = jax.lax.top_k(all_scores, K)
        return jnp.take_along_axis(all_seq, idx[:, :, None], axis=1), top
    bidx = jnp.arange(B)
    best_fin = jnp.argmax(fin_logp, axis=-1)
    best_alive = jnp.argmax(alive_norm, axis=-1)
    use_fin = fin_logp[bidx, best_fin] >= alive_norm[bidx, best_alive]
    toks = jnp.where(use_fin[:, None],
                     fin_seq[bidx, best_fin], alive_seq[bidx, best_alive])
    scores = jnp.where(use_fin, fin_logp[bidx, best_fin],
                       alive_norm[bidx, best_alive])
    return toks, scores


def tile_state(state, beam_width: int, batch: int):
    """Repeat each batch row K times along the batch axis of every state leaf.

    DecoderState is handled explicitly (h/c carry a leading LAYERS axis; the
    generic shape heuristic mis-fires when num_lstm_layers == batch_size)."""
    from vidcap_tpu.models.decoder import DecoderState

    if isinstance(state, DecoderState):
        return DecoderState(
            h=jnp.repeat(state.h, beam_width, axis=1),      # [L, B*K, H]
            c=jnp.repeat(state.c, beam_width, axis=1),
            keys=jnp.repeat(state.keys, beam_width, axis=0),
            values=jnp.repeat(state.values, beam_width, axis=0),
            frame_mask=jnp.repeat(state.frame_mask, beam_width, axis=0))

    def tile(x):
        if x.ndim >= 2 and x.shape[0] != batch and x.shape[1] == batch:
            return jnp.repeat(x, beam_width, axis=1)        # [L, B*K, H]
        return jnp.repeat(x, beam_width, axis=0)            # [B*K, ...]

    return jax.tree_util.tree_map(tile, state)


def tile_recurrent(state, beam_width: int):
    """Beam-tile ONLY the recurrent state (h, c → [layers, B·K, H]); attention
    tensors stay per-video for the shared-keys beam step (decoder.step_beam)."""
    from vidcap_tpu.models.decoder import DecoderState
    return DecoderState(
        h=jnp.repeat(state.h, beam_width, axis=1),
        c=jnp.repeat(state.c, beam_width, axis=1),
        keys=state.keys, values=state.values, frame_mask=state.frame_mask)


def beam_decode_fused(step_h_fn, out_w, out_b, state, batch: int,
                      max_len: int, beam_width: int, vocab_size: int,
                      length_penalty: float = 0.0) -> Tuple[Array, Array]:
    """Beam search with the fused Pallas project+top-K kernel
    (ops/pallas_topk.py): ``step_h_fn(state, tok) → (state, h [B*K, H])``; the
    [B·K, V] logits never hit HBM. Semantics match :func:`beam_decode` — the
    union of per-row top-Ks contains the global top-K (up to tie order)."""
    from vidcap_tpu.ops.pallas_topk import topk_project

    K = beam_width
    B = batch
    NEG = -1e30

    def lp_norm(logp, lengths):
        return logp / _lp_factor(length_penalty, lengths)

    gather_state = _make_state_gather(B, K, recurrent_only_gather=True)

    def step(carry, t):
        st, prev_tok, alive_logp, alive_seq, finished = carry
        st, h = step_h_fn(st, prev_tok)                       # h: [B*K, H]
        logp_k, idx_k = topk_project(h, out_w, out_b, K=K,
                                     vocab_size=vocab_size)   # [B*K, K]
        logp_k = logp_k.reshape(B, K, K)
        idx_k = idx_k.reshape(B, K, K).astype(jnp.int32)

        # finished beams: only candidate is PAD at zero cost
        fin = finished[:, :, None]
        first_slot = (jnp.arange(K) == 0)[None, None, :]
        logp_k = jnp.where(fin, jnp.where(first_slot, 0.0, NEG), logp_k)
        idx_k = jnp.where(fin, PAD, idx_k)

        cand = alive_logp[:, :, None] + logp_k                # [B, K, K]
        beam_mask = jnp.where(
            (t == 0) & (jnp.arange(K)[None, :, None] > 0), NEG, 0.0)
        cand = cand + beam_mask

        flat = cand.reshape(B, K * K)
        top_logp, top_idx = jax.lax.top_k(flat, K)            # [B, K]
        src_beam = top_idx // K
        src_pos = top_idx % K
        bidx = jnp.arange(B)[:, None]
        new_tok = idx_k[bidx, src_beam, src_pos]              # [B, K]

        new_seq = alive_seq[bidx, src_beam]
        new_seq = new_seq.at[:, :, t].set(new_tok)
        was_finished = finished[bidx, src_beam]
        new_finished = was_finished | (new_tok == EOS)

        flat_src = (bidx * K + src_beam).reshape(B * K)
        st = gather_state(st, flat_src)
        return (st, new_tok.reshape(B * K), top_logp, new_seq,
                new_finished), None

    alive_seq = jnp.zeros((B, K, max_len), jnp.int32)
    alive_logp = jnp.zeros((B, K), jnp.float32)
    finished = jnp.zeros((B, K), bool)
    prev_tok = jnp.full((B * K,), BOS, jnp.int32)
    carry = (state, prev_tok, alive_logp, alive_seq, finished)
    (st, _, alive_logp, alive_seq, finished), _ = jax.lax.scan(
        step, carry, jnp.arange(max_len))

    lengths = (alive_seq != PAD).astype(jnp.float32).sum(-1)
    scores = lp_norm(alive_logp, lengths)
    best = jnp.argmax(scores, axis=-1)
    bidx = jnp.arange(B)
    return alive_seq[bidx, best], scores[bidx, best]
