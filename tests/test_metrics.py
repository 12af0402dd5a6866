"""Metric oracles (SURVEY.md C16): hand-derived closed-form checks of CIDEr-D /
BLEU / ROUGE-L semantics (pycocoevalcap is not installed in this image, so values
are derived analytically from the toolkit's published formulas)."""
import math

import numpy as np
import pytest

from vidcap_tpu.metrics.bleu import corpus_bleu, sentence_bleu4
from vidcap_tpu.metrics.cider import CiderScorer, cider_d
from vidcap_tpu.metrics.evaluate import evaluate_captions
from vidcap_tpu.metrics.rouge import rouge_l, rouge_l_sentence


GTS = {"v1": [["a", "b"]], "v2": [["c", "d"]]}


def test_cider_perfect_two_token_match():
    # hand derivation: idf = log(2) for every gram; 1-gram and 2-gram cosines are
    # exactly 1; 3/4-gram sums are 0 → score = (1+1+0+0)/4 * 10 = 5.0
    scorer = CiderScorer(GTS)
    assert scorer.score("v1", ["a", "b"]) == pytest.approx(5.0)


def test_cider_half_unigram_match():
    # candidate ["a","x"]: unigram cosine = 0.5, others 0 → 0.5/4*10 = 1.25
    scorer = CiderScorer(GTS)
    assert scorer.score("v1", ["a", "x"]) == pytest.approx(1.25)


def test_cider_length_penalty():
    # same ngram content, shorter candidate → gaussian penalty exp(-Δ²/72)
    gts = {"v": [["a", "b", "c", "d"]], "w": [["x", "y"]]}
    scorer = CiderScorer(gts)
    full = scorer.score("v", ["a", "b", "c", "d"])
    # candidate = first two tokens: Δ=2
    short = scorer.score("v", ["a", "b"])
    assert short < full
    assert full == pytest.approx(10.0)  # perfect match incl. 3/4-grams


def test_cider_multiple_refs_average():
    gts = {"v": [["a", "b"], ["a", "b"]], "w": [["c", "d"]]}
    scorer = CiderScorer(gts)
    one_ref = CiderScorer({"v": [["a", "b"]], "w": [["c", "d"]]})
    assert scorer.score("v", ["a", "b"]) == pytest.approx(
        one_ref.score("v", ["a", "b"]))


def test_cider_works_on_int_ids():
    gts = {"v": [[5, 6, 7]], "w": [[8, 9]]}
    mean, per = cider_d(gts, {"v": [5, 6, 7], "w": [8, 9]})
    assert per["v"] > 5.0 and per["w"] > 0


def test_corpus_bleu_identity():
    gts = {"v": [["a", "b", "c", "d", "e"]]}
    res = {"v": ["a", "b", "c", "d", "e"]}
    bleu = corpus_bleu(gts, res)
    for b in bleu:
        assert b == pytest.approx(1.0, abs=1e-6)


def test_corpus_bleu_brevity_penalty():
    gts = {"v": [["a", "b", "c", "d", "e", "f"]]}
    res = {"v": ["a", "b", "c", "d"]}
    bleu = corpus_bleu(gts, res)
    assert bleu[0] == pytest.approx(math.exp(1 - 6 / 4), rel=1e-6)


def test_sentence_bleu4_ranks_better_candidates_higher():
    refs = [["a", "man", "is", "playing", "guitar"]]
    good = sentence_bleu4(refs, ["a", "man", "is", "playing", "guitar"])
    ok = sentence_bleu4(refs, ["a", "man", "is", "eating", "food"])
    bad = sentence_bleu4(refs, ["the", "dog", "runs"])
    assert good > ok > bad


def test_rouge_identity_and_order():
    refs = [["a", "b", "c", "d"]]
    assert rouge_l_sentence(refs, ["a", "b", "c", "d"]) == pytest.approx(1.0)
    assert rouge_l_sentence(refs, ["a", "c"]) > rouge_l_sentence(refs, ["d", "a"])


def test_evaluate_captions_end_to_end():
    gts = {"v1": ["a man is playing guitar", "a person plays a guitar"],
           "v2": ["a dog runs in the park"]}
    res = {"v1": ["a man is playing guitar"], "v2": ["a dog runs"]}
    scores = evaluate_captions(gts, res)
    for k in ("Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr", "METEOR"):
        assert k in scores and np.isfinite(scores[k])
    assert scores["Bleu_1"] > 0.5
    assert scores["CIDEr"] > 1.0
