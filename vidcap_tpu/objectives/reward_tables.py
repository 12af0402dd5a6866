"""Host-side construction of the on-device CIDEr/BLEU reward tables
(SURVEY.md §7.3, §3.2; BASELINE.json configs[4]).

Built ONCE per dataset at train start; everything the per-step reward needs lives
in fixed-shape device arrays:

  * per-video reference n-gram tables — hashed keys (ops/ngram_hash.py), term
    frequencies, corpus IDF weights, per-(ref, order) norms, reference lengths
  * a corpus-wide open-addressing IDF hash table for the candidate-norm lookups
    (grams absent from the corpus get the df=0 weight log N, exactly like
    pycocoevalcap's ``ref_len - log(max(1, df))`` with df missing)

Parity oracle: metrics/cider.py run on the same integer token sequences.
"""
from __future__ import annotations

import dataclasses
import math
from collections import Counter, defaultdict
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vidcap_tpu.ops.ngram_hash import host_ngram_key

NGRAMS = 4


@dataclasses.dataclass
class RewardTables:
    """Device-resident reward tables. V videos, R max refs, G max grams/ref,
    S IDF-table slots. All fixed-shape."""

    ref_key_lo: jax.Array    # u32[V, R, G]
    ref_key_hi: jax.Array    # u32[V, R, G]
    ref_tf: jax.Array        # f32[V, R, G]
    ref_idf: jax.Array       # f32[V, R, G]
    ref_order: jax.Array     # i32[V, R, G]  1..4, 0 = pad slot
    ref_norm: jax.Array      # f32[V, R, 4]  per-order tf-idf vector norms
    ref_len: jax.Array       # f32[V, R]     unigram count
    ref_valid: jax.Array     # f32[V, R]     1.0 = real reference
    num_refs: jax.Array      # f32[V]
    idf_key_lo: jax.Array    # u32[S] open-addressing table (0 = empty since
    idf_key_hi: jax.Array    # u32[S]  real keys are never (0,0) in practice)
    idf_val: jax.Array       # f32[S]
    log_n: float             # log(num ref-bearing videos) — idf weight on miss
    num_probes: int          # linear-probe length used at build time


jax.tree_util.register_pytree_node(
    RewardTables,
    lambda t: ((t.ref_key_lo, t.ref_key_hi, t.ref_tf, t.ref_idf, t.ref_order,
                t.ref_norm, t.ref_len, t.ref_valid, t.num_refs,
                t.idf_key_lo, t.idf_key_hi, t.idf_val),
               (t.log_n, t.num_probes)),
    lambda aux, ch: RewardTables(*ch, log_n=aux[0], num_probes=aux[1]),
)


def _ref_entries(tokens: Sequence[int]):
    """Unique n-gram entries (lo, hi, tf, order) for one reference — native C++
    fast path (native/vidcap_native.cpp, hash-parity-tested) with a pure-Python
    fallback."""
    from vidcap_tpu import native
    out = native.ref_ngrams(tokens, NGRAMS)
    if out is not None:
        lo, hi, tf, order = out
        return list(zip(lo.tolist(), hi.tolist(), tf.tolist(),
                        order.tolist()))
    entries = []
    for n in range(1, NGRAMS + 1):
        counter = Counter(tuple(tokens[i: i + n])
                          for i in range(len(tokens) - n + 1))
        for gram, tf in counter.items():
            lo, hi = host_ngram_key(gram, n)
            entries.append((lo, hi, float(tf), n))
    return entries


def build_reward_tables(refs_per_video: List[List[Sequence[int]]],
                        max_probes: int = 16) -> RewardTables:
    """refs_per_video[v] = list of tokenized (id-sequence) references for video v,
    WITHOUT <bos>/<eos>/<pad>. Order must match the dataset's video indexing.

    Internally keyed on the 64-bit n-gram hashes throughout (exactly what the
    device sees), so the native C++ counter plugs in directly."""
    V = len(refs_per_video)
    # IDF document count = videos that actually carry references. Ref-less
    # rows (MSR-VTT test-server entries, partially-captioned corpora) are
    # feature-alignment placeholders, not corpus documents — pycocoevalcap's
    # ref_len = log(len(crefs)) likewise only ever counts entries with refs.
    # The additive log-N term does NOT cancel in the tf-idf cosine, so
    # counting placeholders would shift every reward (tests/test_reward.py::
    # test_refless_videos_do_not_perturb_table).
    n_docs = sum(1 for r in refs_per_video if r)
    log_n = math.log(max(n_docs, 1))

    # per-ref hashed entries, computed once
    per_video_entries: List[List[List[tuple]]] = [
        [_ref_entries(r) for r in refs] for refs in refs_per_video]

    # ---- corpus document frequency over per-video reference SETS of hash keys
    df: Dict[tuple, int] = defaultdict(int)
    for refs in per_video_entries:
        seen = set()
        for entries in refs:
            seen.update((lo, hi) for lo, hi, _, _ in entries)
        for k in seen:
            df[k] += 1

    def idf_weight(key: tuple) -> float:
        return log_n - math.log(max(1.0, df.get(key, 0)))

    # ---- per-video ref tables
    R = max((len(r) for r in refs_per_video), default=1)
    G = 1
    per_video = []
    for refs, refs_entries in zip(refs_per_video, per_video_entries):
        per_ref = []
        for r, raw in zip(refs, refs_entries):
            entries = []   # (lo, hi, tf, idf, order)
            sq = [0.0] * NGRAMS
            for lo, hi, tf, n in raw:
                w = idf_weight((lo, hi))
                entries.append((lo, hi, float(tf), w, int(n)))
                sq[int(n) - 1] += (tf * w) ** 2
            norms = [math.sqrt(s) for s in sq]
            per_ref.append((entries, norms, float(len(r))))
            G = max(G, len(entries))
        per_video.append(per_ref)

    key_lo = np.zeros((V, R, G), np.uint32)
    key_hi = np.zeros((V, R, G), np.uint32)
    tf = np.zeros((V, R, G), np.float32)
    idf = np.zeros((V, R, G), np.float32)
    order = np.zeros((V, R, G), np.int32)
    norm = np.zeros((V, R, NGRAMS), np.float32)
    rlen = np.zeros((V, R), np.float32)
    valid = np.zeros((V, R), np.float32)
    nrefs = np.zeros((V,), np.float32)

    for v, per_ref in enumerate(per_video):
        nrefs[v] = max(len(per_ref), 1)
        for r, (entries, norms, length) in enumerate(per_ref):
            for g, (lo, hi, t, w, n) in enumerate(entries):
                key_lo[v, r, g] = lo
                key_hi[v, r, g] = hi
                tf[v, r, g] = t
                idf[v, r, g] = w
                order[v, r, g] = n
            norm[v, r] = norms
            rlen[v, r] = length
            valid[v, r] = 1.0

    # ---- corpus IDF open-addressing table (for candidate norms)
    uniq = list(df.keys())
    S = 1 << max(int(math.ceil(math.log2(max(len(uniq) * 2, 16)))), 4)
    t_lo = np.zeros((S,), np.uint32)
    t_hi = np.zeros((S,), np.uint32)
    t_val = np.full((S,), log_n, np.float32)   # miss ⇒ default weight anyway
    used = np.zeros((S,), bool)
    probes_needed = 1
    for lo, hi in uniq:
        slot = lo % S
        p = 0
        while used[slot] and not (t_lo[slot] == lo and t_hi[slot] == hi):
            slot = (slot + 1) % S
            p += 1
            if p >= S:
                raise RuntimeError("idf table full")
        used[slot] = True
        t_lo[slot] = lo
        t_hi[slot] = hi
        t_val[slot] = idf_weight((lo, hi))
        probes_needed = max(probes_needed, p + 1)
    if probes_needed > max_probes:
        raise RuntimeError(
            f"idf table needs {probes_needed} probes > cap {max_probes}; "
            f"increase table size")

    return RewardTables(
        ref_key_lo=jnp.asarray(key_lo), ref_key_hi=jnp.asarray(key_hi),
        ref_tf=jnp.asarray(tf), ref_idf=jnp.asarray(idf),
        ref_order=jnp.asarray(order), ref_norm=jnp.asarray(norm),
        ref_len=jnp.asarray(rlen), ref_valid=jnp.asarray(valid),
        num_refs=jnp.asarray(nrefs),
        idf_key_lo=jnp.asarray(t_lo), idf_key_hi=jnp.asarray(t_hi),
        idf_val=jnp.asarray(t_val), log_n=log_n, num_probes=probes_needed)


def tables_from_dataset(dataset) -> RewardTables:
    """Build tables from a CaptionDataset: references are the tokenized captions
    (specials stripped), grouped by video in dataset.video_ids order."""
    refs: List[List[List[int]]] = [[] for _ in dataset.video_ids]
    for row, vidx in zip(dataset.tokens, dataset.caption_video_idx):
        ids = [int(t) for t in row if t >= 3]  # strip PAD/BOS/EOS, keep <unk>
        refs[int(vidx)].append(ids)
    return build_reward_tables(refs)
