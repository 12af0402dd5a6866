"""Native C++ host library parity (native/vidcap_native.cpp vs pure-Python):
hash bit-equality, tokenizer parity, n-gram entry-set equality."""
import numpy as np
import pytest

from vidcap_tpu import native
from vidcap_tpu.data.vocab import ptb_tokenize
from vidcap_tpu.ops.ngram_hash import host_ngram_key

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_hash_parity():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(1, 5))
        toks = rng.integers(0, 30000, size=n).tolist()
        assert native.ngram_hash(toks, n) == host_ngram_key(toks, n)


def test_tokenizer_parity():
    cases = [
        "A man, is PLAYING guitar!",
        "  hello   world  ",
        "don't stop-me_now (ok)?",
        "x &amp; y &lt;z&gt;",
        "...",
        "",
        "The quick/brown\\fox",
    ]
    for c in cases:
        assert native.tokenize(c) == ptb_tokenize(c), c


def test_ref_ngrams_match_python():
    rng = np.random.default_rng(1)
    for _ in range(20):
        toks = rng.integers(4, 100, size=int(rng.integers(1, 15))).tolist()
        out = native.ref_ngrams(toks)
        assert out is not None
        lo, hi, tf, order = out
        native_set = {(int(l), int(h), float(t), int(o))
                      for l, h, t, o in zip(lo, hi, tf, order)}
        # python reference
        from collections import Counter
        py_set = set()
        for n in range(1, 5):
            c = Counter(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))
            for g, t in c.items():
                l, h = host_ngram_key(g, n)
                py_set.add((l, h, float(t), n))
        assert native_set == py_set
