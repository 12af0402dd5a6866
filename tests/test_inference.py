"""Inference + CLI integration (SURVEY.md C18, §4.4)."""
import json

import numpy as np

from vidcap_tpu.inference import Captioner


def test_caption_dataset_all_methods(tiny_cfg, tiny_dataset):
    cap = Captioner.from_checkpoint(tiny_cfg, tiny_dataset, checkpoint_dir=None)
    for method in ("greedy", "sample", "beam"):
        results = cap.caption_dataset(method=method, beam_width=3, batch_size=8)
        assert set(results) == set(tiny_dataset.video_ids)
        for vid, caps in results.items():
            assert isinstance(caps, list) and isinstance(caps[0], str)


def test_cli_train_caption_eval(tmp_path, monkeypatch):
    """The reference's public workflow: train → caption → eval (BASELINE.json)."""
    from vidcap_tpu.cli.main import main
    monkeypatch.chdir(tmp_path)
    assert main(["train", "--preset", "synthetic_tiny", "--steps", "4",
                 "--log-file", str(tmp_path / "log.jsonl")]) == 0
    out = tmp_path / "caps.json"
    assert main(["caption", "--preset", "synthetic_tiny", "--method", "greedy",
                 "--out", str(out)]) == 0
    results = json.load(open(out))
    assert len(results) > 0
    assert main(["eval", "--preset", "synthetic_tiny",
                 "--captions", str(out)]) == 0
    assert main(["sample", "--preset", "synthetic_tiny",
                 "--out", str(tmp_path / "s.json")]) == 0


def test_seeded_sampling_reproducible(tiny_cfg, tiny_dataset):
    """Captioner(seed=N) makes multinomial sampling bit-reproducible across
    fresh captioners; unseeded captioners stay wall-clock-seeded (VERDICT r1
    weak #7)."""
    feats = np.asarray(
        np.random.default_rng(3).normal(
            size=(4, tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim)),
        np.float32)
    cap1 = Captioner.from_checkpoint(tiny_cfg, tiny_dataset,
                                     checkpoint_dir=None, seed=7)
    cap2 = Captioner.from_checkpoint(tiny_cfg, tiny_dataset,
                                     checkpoint_dir=None, seed=7)
    a1 = cap1.decode_batch(feats, method="sample", temperature=1.0)
    b1 = cap2.decode_batch(feats, method="sample", temperature=1.0)
    np.testing.assert_array_equal(a1, b1)
    # consecutive calls draw different tokens (counter advances)
    a2 = cap1.decode_batch(feats, method="sample", temperature=1.0)
    assert not np.array_equal(a1, a2)


def test_decode_batch_frame_mask_matters(tiny_cfg, tiny_dataset):
    """frame_mask actually gates attention: a masked decode of zero-padded
    features equals decoding with garbage in the masked-out frames."""
    T, D = tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim
    rng = np.random.default_rng(5)
    base = rng.normal(size=(4, T, D)).astype(np.float32)
    t = max(1, T // 2)
    mask = np.zeros((4, T), np.float32)
    mask[:, :t] = 1.0
    garbage = base.copy()
    garbage[:, t:] = rng.normal(size=(4, T - t, D)).astype(np.float32) * 50

    cap = Captioner.from_checkpoint(tiny_cfg, tiny_dataset, checkpoint_dir=None)
    for method in ("greedy", "beam"):
        a = cap.decode_batch(base, method=method, beam_width=3,
                             frame_mask=mask)
        b = cap.decode_batch(garbage, method=method, beam_width=3,
                             frame_mask=mask)
        np.testing.assert_array_equal(a, b)


def test_beam_finished_pool_auto_via_captioner(tiny_cfg, tiny_dataset):
    """decode.finished_pool='auto' routes the Captioner's beam through the
    finished-pool implementation exactly when length_penalty != 0; output
    stays a valid, deterministic caption batch."""
    import dataclasses
    feats = np.asarray(
        np.random.default_rng(5).normal(
            size=(4, tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim)),
        np.float32)

    lp_cfg = dataclasses.replace(
        tiny_cfg, decode=dataclasses.replace(tiny_cfg.decode,
                                             length_penalty=1.0))
    cap_pool = Captioner.from_checkpoint(lp_cfg, tiny_dataset,
                                         checkpoint_dir=None)
    a = cap_pool.decode_batch(feats, method="beam", beam_width=3)
    b = cap_pool.decode_batch(feats, method="beam", beam_width=3)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, lp_cfg.decode.max_len)

    # forced off → slot-blocking under the same lp still decodes fine
    off_cfg = dataclasses.replace(
        lp_cfg, decode=dataclasses.replace(lp_cfg.decode,
                                           finished_pool="off"))
    cap_off = Captioner.from_checkpoint(off_cfg, tiny_dataset,
                                        checkpoint_dir=None)
    c = cap_off.decode_batch(feats, method="beam", beam_width=3)
    assert c.shape == a.shape


def test_pallas_sample_path_accepts_explicit_rng(tiny_cfg, tiny_dataset):
    """Review r2 finding 2 regression: decode_batch(method='sample', rng=key)
    on the Pallas path derived its kernel seed via jax.random.randint with
    maxval=1<<31, which overflows int32 and crashed unconditionally."""
    import dataclasses

    import jax
    cfg = dataclasses.replace(
        tiny_cfg, model=dataclasses.replace(tiny_cfg.model,
                                            use_pallas_decoder=True))
    cap = Captioner.from_checkpoint(cfg, tiny_dataset, checkpoint_dir=None)
    B = 8
    feats = np.asarray(
        np.random.default_rng(2).normal(
            size=(B, cfg.data.num_frames, cfg.data.feature_dim)), np.float32)
    a = cap.decode_batch(feats, method="sample", rng=jax.random.key(3))
    b = cap.decode_batch(feats, method="sample", rng=jax.random.key(3))
    assert a.shape == (B, cfg.decode.max_len)
    np.testing.assert_array_equal(a, b)    # same key → same kernel seed


def test_real_data_layout_full_pipeline(tmp_path, monkeypatch):
    """End-to-end through the REAL dataset file layout (not the synthetic
    fallback): MSVD CSV + youtube mapping → prepare → feature .npy files →
    from_files → train a few steps → caption → eval. Covers the path a real
    user takes with downloaded assets."""
    import dataclasses
    import subprocess  # noqa: F401  (documents the CLI-equivalence of steps)

    import numpy as np
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.data.prepare import prepare
    from vidcap_tpu.metrics.evaluate import evaluate_captions
    from vidcap_tpu.train.loop import train
    from vidcap_tpu.utils.logging import MetricsLogger

    # --- assets: 12 videos, canonical mapping, English+foreign captions
    n = 12
    keys = [f"yt{i:03d}_0_{i + 5}" for i in range(n)]
    csv_lines = ["VideoID,Start,End,Language,Description"]
    words = ["a man is running", "a dog is barking", "a cat is jumping"]
    for i, k in enumerate(keys):
        vid, s, e = k.rsplit("_", 2)
        csv_lines.append(f"{vid},{s},{e},English,{words[i % 3]} number {i}")
        csv_lines.append(f"{vid},{s},{e},Spanish,un hombre corre")
    (tmp_path / "msvd.csv").write_text("\n".join(csv_lines) + "\n")
    (tmp_path / "map.txt").write_text(
        "".join(f"{k} vid{i + 1}\n" for i, k in enumerate(keys)))

    cfg = get_preset("synthetic_tiny")
    data = dataclasses.replace(cfg.data, dataset="msvd",
                               data_dir=str(tmp_path), min_word_count=1)
    cfg = dataclasses.replace(
        cfg, data=data,
        train=dataclasses.replace(cfg.train, num_steps=6, eval_every=0,
                                  checkpoint_every=100, log_every=100,
                                  checkpoint_dir=str(tmp_path / "ckpt")))

    prepare(cfg.data, [str(tmp_path / "msvd.csv")],
            mapping=str(tmp_path / "map.txt"))
    # all 12 land in train (vid index ≤ 1200); write features for the split
    import json
    ids = json.load(open(tmp_path / "msvd_train_ids.json"))
    assert ids == keys                       # canonical vid order preserved
    rng = np.random.default_rng(0)
    np.save(tmp_path / "msvd_train_feats.npy",
            rng.normal(size=(len(ids), cfg.data.num_frames,
                             cfg.data.feature_dim)).astype(np.float32))

    ds = CaptionDataset.from_files(cfg.data, split="train")
    assert ds.num_videos == n and ds.num_captions == n   # Spanish dropped
    state = train(cfg, dataset=ds, logger=MetricsLogger(quiet=True))
    assert int(state.step) == 6

    cap = Captioner.from_state(cfg, ds, state)
    results = cap.caption_dataset(method="greedy", batch_size=8)
    assert set(results) == set(keys)
    scores = evaluate_captions(
        {v: ds.video_captions[v] for v in results}, results)
    for k in ("Bleu_4", "CIDEr", "METEOR", "ROUGE_L"):
        assert np.isfinite(scores[k])


def test_from_checkpoint_empty_dir_is_an_error(tmp_path, tiny_cfg,
                                               tiny_dataset):
    """A NAMED checkpoint dir with no checkpoint in it must error, not fall
    back to random-init weights — caption/serve/export would silently emit
    garbage (or bake it into an AOT artifact). checkpoint_dir=None stays the
    explicit fresh-params path (review r4)."""
    import pytest
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        Captioner.from_checkpoint(tiny_cfg, tiny_dataset,
                                  checkpoint_dir=str(tmp_path / "empty"))
    Captioner.from_checkpoint(tiny_cfg, tiny_dataset, checkpoint_dir=None)


def test_nbest_beam_captions(tiny_cfg, tiny_dataset):
    """caption --nbest surface: nbest beam hypotheses per video, best first,
    with the first entry identical to the default best-1 decode; invalid
    nbest combinations reject loudly."""
    import pytest
    cap = Captioner.from_checkpoint(tiny_cfg, tiny_dataset, checkpoint_dir=None)
    one = cap.caption_dataset(method="beam", beam_width=3, batch_size=8)
    three = cap.caption_dataset(method="beam", beam_width=3, batch_size=8,
                                nbest=3)
    assert set(three) == set(tiny_dataset.video_ids)
    for vid, caps in three.items():
        assert len(caps) == 3 and all(isinstance(c, str) for c in caps)
        assert caps[0] == one[vid][0]       # rank 0 == the best-1 winner
    feats = np.asarray(
        np.random.default_rng(9).normal(
            size=(4, tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim)),
        np.float32)
    toks = cap.decode_batch(feats, method="beam", beam_width=3, nbest=2)
    assert toks.shape == (4, 2, cap.max_len)
    with pytest.raises(ValueError, match="beam"):
        cap.decode_batch(feats, method="greedy", nbest=2)
    with pytest.raises(ValueError, match="nbest"):
        cap.decode_batch(feats, method="beam", beam_width=3, nbest=4)


def test_cli_caption_nbest(tmp_path, monkeypatch):
    from vidcap_tpu.cli.main import main
    import pytest
    monkeypatch.chdir(tmp_path)
    assert main(["train", "--preset", "synthetic_tiny", "--steps", "3"]) == 0
    out = tmp_path / "nbest.json"
    assert main(["caption", "--preset", "synthetic_tiny", "--method", "beam",
                 "--beam", "3", "--nbest", "3", "--out", str(out)]) == 0
    results = json.load(open(out))
    assert results and all(len(v) == 3 for v in results.values())
    with pytest.raises(SystemExit, match="beam"):
        main(["caption", "--preset", "synthetic_tiny", "--method", "greedy",
              "--nbest", "2", "--out", str(out)])


def test_cli_info_preflight(capsys):
    """`info` census: eval_shape param counts match a real init, memory
    estimate fields present, --json parses."""
    import jax
    from vidcap_tpu.cli.main import main
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.model import create_model, init_params

    assert main(["info", "--preset", "synthetic_tiny", "--json",
                 "--no-devices"]) == 0
    info = json.loads(capsys.readouterr().out)
    cfg = get_preset("synthetic_tiny")
    model = create_model(cfg, vocab_size=cfg.data.vocab_size)
    params = init_params(model, cfg, jax.random.key(0))
    real = sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))
    assert info["params"]["_total"] == real       # census == real init
    assert info["train_step_hbm_estimate_bytes"]["total"] > 0
    assert info["dims"]["padded_vocab"] % 128 == 0
    # human-readable mode also runs
    assert main(["info", "--preset", "e2e_scst_multitask",
                 "--no-devices"]) == 0
    out = capsys.readouterr().out
    assert "backbone" in out and "rough HBM" in out
