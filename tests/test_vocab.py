"""Vocabulary / tokenizer unit tests (SURVEY.md C4)."""
import numpy as np

from vidcap_tpu.data.vocab import (BOS, EOS, PAD, UNK, Vocab, build_vocab,
                                   ptb_tokenize)


def test_ptb_tokenize_lowercase_and_punct():
    assert ptb_tokenize("A man, is PLAYING!") == ["a", "man", "is", "playing"]
    assert ptb_tokenize("") == []
    assert ptb_tokenize("...") == []


def test_build_vocab_min_count():
    caps = ["a dog runs", "a dog sits", "a cat"]
    v = build_vocab(caps, min_count=2)
    assert v.word_to_id["<pad>"] == PAD
    assert "dog" in v.word_to_id and "a" in v.word_to_id
    assert "cat" not in v.word_to_id  # count 1 < min_count 2


def test_encode_caption_shape_and_eos():
    v = build_vocab(["a dog runs fast"] * 2, min_count=1)
    ids = v.encode_caption("a dog runs fast", max_len=8)
    assert len(ids) == 8
    n_real = ids.index(EOS)
    assert all(i == PAD for i in ids[n_real + 1:])
    assert EOS in ids


def test_encode_caption_truncates():
    v = build_vocab(["a b c d e f g h"] * 2, min_count=1)
    ids = v.encode_caption("a b c d e f g h", max_len=4)
    assert len(ids) == 4 and ids[3] == EOS


def test_decode_roundtrip():
    v = build_vocab(["a dog runs"] * 2, min_count=1)
    ids = v.encode_caption("a dog runs", max_len=6)
    assert v.decode_str(ids) == "a dog runs"


def test_unk():
    v = build_vocab(["a dog"] * 2, min_count=1)
    assert v.encode(["zebra"]) == [UNK]


def test_save_load(tmp_path):
    v = build_vocab(["a dog runs"] * 2, min_count=1)
    p = str(tmp_path / "vocab.json")
    v.save(p)
    v2 = Vocab.load(p)
    assert v2.word_to_id == v.word_to_id
