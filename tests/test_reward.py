"""On-device reward parity (SURVEY.md §7 hard-part #1): device CIDEr-D must match
the host oracle (metrics/cider.py, pycocoevalcap semantics) to float tolerance on
random token corpora; BLEU-4 likewise vs metrics/bleu.sentence_bleu4."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu.metrics.bleu import sentence_bleu4
from vidcap_tpu.metrics.cider import CiderScorer
from vidcap_tpu.objectives.reward import bleu4_reward, cider_reward
from vidcap_tpu.objectives.reward_tables import build_reward_tables
from vidcap_tpu.ops.ngram_hash import device_ngram_keys, host_ngram_key


def _random_corpus(rng, n_videos=12, vocab=50, n_refs=(1, 4), len_range=(3, 12)):
    refs = []
    for _ in range(n_videos):
        k = rng.integers(n_refs[0], n_refs[1] + 1)
        refs.append([
            rng.integers(4, vocab, size=rng.integers(*len_range)).tolist()
            for _ in range(k)
        ])
    return refs


def _pad_candidates(cands, L, eos=2):
    toks = np.zeros((len(cands), L), np.int32)
    mask = np.zeros((len(cands), L), np.float32)
    for i, c in enumerate(cands):
        c = c[: L - 1]
        toks[i, : len(c)] = c
        toks[i, len(c)] = eos            # rollout-style: eos terminated
        mask[i, : len(c) + 1] = 1.0
    return jnp.asarray(toks), jnp.asarray(mask)


def test_hash_host_device_parity():
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 30_000, size=(3, 9)).astype(np.int32)
    los, his = device_ngram_keys(jnp.asarray(toks))
    for n in range(1, 5):
        for b in range(3):
            for i in range(9 - n + 1):
                lo, hi = host_ngram_key(toks[b, i: i + n].tolist(), n)
                assert int(los[n - 1][b, i]) == lo
                assert int(his[n - 1][b, i]) == hi


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_cider_matches_host_oracle(seed):
    rng = np.random.default_rng(seed)
    refs = _random_corpus(rng)
    tables = build_reward_tables(refs)

    gts = {str(v): [list(map(int, r)) for r in rs] for v, rs in enumerate(refs)}
    oracle = CiderScorer(gts)

    # candidates: mix of exact refs, perturbed refs, and random junk
    cands, vids = [], []
    for v in range(len(refs)):
        base = list(refs[v][0])
        cands.append(base)                                   # exact
        pert = list(base)
        if len(pert) > 2:
            pert[1] = int(rng.integers(4, 50))
        cands.append(pert)                                   # perturbed
        cands.append(rng.integers(4, 50, size=6).tolist())   # junk
        vids += [v, v, v]

    toks, mask = _pad_candidates(cands, L=16)
    vidx = jnp.asarray(vids, jnp.int32)
    dev = np.asarray(cider_reward(tables, vidx, toks, mask))

    host = np.array([oracle.score(str(v), c) for v, c in zip(vids, cands)])
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_device_bleu4_matches_host_oracle(seed):
    rng = np.random.default_rng(seed)
    refs = _random_corpus(rng)
    tables = build_reward_tables(refs)

    cands, vids = [], []
    for v in range(len(refs)):
        cands.append(list(refs[v][0]))
        cands.append(rng.integers(4, 50, size=5).tolist())
        vids += [v, v]
    toks, mask = _pad_candidates(cands, L=16)
    dev = np.asarray(bleu4_reward(tables, jnp.asarray(vids, jnp.int32),
                                  toks, mask))
    host = np.array([sentence_bleu4([list(r) for r in refs[v]], c)
                     for v, c in zip(vids, cands)])
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_empty_candidate_zero_reward():
    refs = [[[5, 6, 7]], [[8, 9]]]
    tables = build_reward_tables(refs)
    toks = jnp.asarray([[2, 0, 0, 0]], jnp.int32)   # immediate <eos>
    mask = jnp.asarray([[1, 0, 0, 0]], jnp.float32)
    r = cider_reward(tables, jnp.asarray([0]), toks, mask)
    assert float(r[0]) == pytest.approx(0.0, abs=1e-6)
    b = bleu4_reward(tables, jnp.asarray([0]), toks, mask)
    assert float(b[0]) == pytest.approx(0.0, abs=1e-6)


def test_reward_jits_and_batches():
    rng = np.random.default_rng(5)
    refs = _random_corpus(rng, n_videos=8)
    tables = build_reward_tables(refs)
    f = jax.jit(lambda v, t, m: cider_reward(tables, v, t, m))
    toks, mask = _pad_candidates([[5, 6, 7]] * 8, L=10)
    out = f(jnp.arange(8, dtype=jnp.int32), toks, mask)
    assert out.shape == (8,) and np.isfinite(np.asarray(out)).all()


def test_device_cider_matches_host_oracle_refless():
    """Device/host bit-parity must survive ref-less rows: both stacks count
    only ref-bearing videos as IDF documents (review r5 — the table-side fix
    alone would silently break the CLAUDE.md parity invariant on
    partially-captioned corpora like data/scale_small)."""
    rng = np.random.default_rng(11)
    refs = _random_corpus(rng, n_videos=6) + [[], [], []]
    tables = build_reward_tables(refs)
    gts = {str(v): [list(map(int, r)) for r in rs]
           for v, rs in enumerate(refs)}
    oracle = CiderScorer(gts)

    cands, vids = [], []
    for v in range(6):
        cands.append(list(refs[v][0]))
        cands.append(rng.integers(4, 50, size=6).tolist())
        vids += [v, v]
    toks, mask = _pad_candidates(cands, L=16)
    dev = np.asarray(cider_reward(tables, jnp.asarray(vids, jnp.int32),
                                  toks, mask))
    host = np.array([oracle.score(str(v), c) for v, c in zip(vids, cands)])
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_refless_videos_do_not_perturb_table(tmp_path):
    """Videos with ZERO references (MSR-VTT test-server rows; the r5
    small-data corpus trick of emptying caption lists while keeping feature
    rows aligned) must build finite tables and leave the rewards of
    captioned videos bit-identical to a table built without them."""
    rng = np.random.default_rng(7)
    refs = _random_corpus(rng, n_videos=6)
    padded = refs + [[], [], []]          # ref-less rows appended after

    t_base = build_reward_tables(refs)
    t_pad = build_reward_tables(padded)
    for t in (t_base, t_pad):
        for leaf in (t.ref_tf, t.ref_idf, t.ref_norm, t.idf_val):
            assert bool(jnp.isfinite(leaf).all())

    cands, vids = [], []
    for v in range(len(refs)):
        cands.append(list(refs[v][0]))
        cands.append(rng.integers(4, 50, size=6).tolist())
        vids += [v, v]
    toks, mask = _pad_candidates(cands, L=16)
    vidx = jnp.asarray(vids, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(cider_reward(t_base, vidx, toks, mask)),
        np.asarray(cider_reward(t_pad, vidx, toks, mask)))
    np.testing.assert_array_equal(
        np.asarray(bleu4_reward(t_base, vidx, toks, mask)),
        np.asarray(bleu4_reward(t_pad, vidx, toks, mask)))
