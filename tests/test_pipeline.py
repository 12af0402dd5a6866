"""Deterministic pipeline: resume parity (SURVEY.md §5 failure recovery)."""
import numpy as np

from vidcap_tpu.data.pipeline import (DeterministicBatcher, IteratorState,
                                      PrefetchBatcher)


def test_resume_reproduces_stream(tiny_dataset):
    b1 = DeterministicBatcher(tiny_dataset, batch_size=8, seed=5)
    first = [next(b1) for _ in range(7)]
    saved = b1.state.to_dict()
    tail1 = [next(b1) for _ in range(9)]

    b2 = DeterministicBatcher(tiny_dataset, batch_size=8,
                              state=IteratorState.from_dict(saved))
    tail2 = [next(b2) for _ in range(9)]
    for a, b in zip(tail1, tail2):
        np.testing.assert_array_equal(a.tokens, b.tokens)
        np.testing.assert_array_equal(a.video_idx, b.video_idx)


def test_epoch_rollover_and_coverage(tiny_dataset):
    b = DeterministicBatcher(tiny_dataset, batch_size=8, seed=1)
    n = tiny_dataset.num_captions // 8
    seen = set()
    for _ in range(n):
        batch = next(b)
        seen.update(batch.tokens.tobytes() for _ in [0])
    assert b.state.epoch in (0, 1)


def test_captionless_split_video_batches(tiny_cfg, tiny_dataset):
    """ADVICE r2: a fully caption-less split (MSR-VTT test-server decode-only
    eval) must still yield fixed-shape video batches — np.argmax over the
    empty caption axis used to crash."""
    from vidcap_tpu.data.loader import CaptionDataset

    n, cfg = 5, tiny_cfg.data
    feats = np.zeros((n, cfg.num_frames, cfg.feature_dim), np.float32)
    ids = [f"v{i}" for i in range(n)]
    ds = CaptionDataset(feats, ids, {v: [] for v in ids}, cfg,
                        vocab=tiny_dataset.vocab)
    assert ds.num_captions == 0
    batches = list(ds.video_batches(batch_size=4))
    assert len(batches) == 2
    for b in batches:
        assert b.tokens.shape == (4, cfg.max_caption_len)
        assert not b.tokens.any() and not b.mask.any()
        assert b.features.shape == (4, cfg.num_frames, cfg.feature_dim)


def test_prefetch_yields_same_stream(tiny_dataset):
    plain = DeterministicBatcher(tiny_dataset, batch_size=8, seed=9)
    pre = PrefetchBatcher(DeterministicBatcher(tiny_dataset, batch_size=8,
                                               seed=9))
    for _ in range(10):
        a, b = next(plain), next(pre)
        np.testing.assert_array_equal(a.tokens, b.tokens)
    pre.close()


def test_prefetch_state_is_consumer_exact(tiny_dataset):
    """PrefetchBatcher.state must reflect what the CONSUMER has seen — not the
    producer, which runs `depth` batches ahead. Resuming from a mid-stream
    snapshot replays exactly the unconsumed remainder (VERDICT r1 weak #2)."""
    import time
    pre = PrefetchBatcher(DeterministicBatcher(tiny_dataset, batch_size=8,
                                               seed=3), depth=4)
    consumed = [next(pre) for _ in range(5)]
    time.sleep(0.05)                 # let the producer run ahead of consumption
    saved = pre.state.to_dict()
    tail1 = [next(pre) for _ in range(6)]
    pre.close()

    resumed = DeterministicBatcher(tiny_dataset, batch_size=8,
                                   state=IteratorState.from_dict(saved))
    tail2 = [next(resumed) for _ in range(6)]
    for a, b in zip(tail1, tail2):
        np.testing.assert_array_equal(a.tokens, b.tokens)
        np.testing.assert_array_equal(a.video_idx, b.video_idx)
