"""CLI one-shot inputs + standalone eval (SURVEY §3.3/§3.4 user workflows):

- `caption --inputs FILE|DIR` captions arbitrary feature files with no
  dataset layout (the batch form of what `serve` does interactively);
- `eval --refs refs.json` scores a captions json against explicit references
  (standalone coco-caption replacement, no preset assets).
"""
import json
import os

import numpy as np
import pytest

from vidcap_tpu.cli.main import main


@pytest.fixture(scope="module")
def trained_ws(tmp_path_factory):
    """A workspace dir holding a 4-step synthetic_tiny checkpoint (the CLI
    restores from cfg.train.checkpoint_dir = 'checkpoints' under cwd)."""
    ws = tmp_path_factory.mktemp("inputs_ws")
    old = os.getcwd()
    os.chdir(ws)
    try:
        assert main(["train", "--preset", "synthetic_tiny", "--steps", "4",
                     "--eval-every", "0"]) == 0
    finally:
        os.chdir(old)
    return ws


def _write_npy_inputs(root, cfg, n=5, seed=0):
    rng = np.random.default_rng(seed)
    d = root / "inputs"
    d.mkdir(exist_ok=True)
    paths = []
    for i in range(n):
        # vary T' below num_frames so the pad/mask path is exercised
        t = cfg.data.num_frames - (i % 3)
        f = rng.normal(size=(t, cfg.data.feature_dim)).astype(np.float32)
        p = d / f"clip_{i}.npy"
        np.save(p, f)
        paths.append(p)
    return d, paths


def test_caption_inputs_files_and_dir(trained_ws, tiny_cfg, monkeypatch):
    monkeypatch.chdir(trained_ws)
    d, paths = _write_npy_inputs(trained_ws, tiny_cfg, n=5)
    out = trained_ws / "caps.json"
    # mix a directory with an explicit file list — the file is also in the
    # dir, and a repeated path is ONE input, not a silent self-overwrite
    # (ADVICE r4)
    assert main(["caption", "--preset", "synthetic_tiny", "--method", "greedy",
                 "--inputs", str(d), str(paths[0]), "--out", str(out)]) == 0
    results = json.load(open(out))
    assert len(results) == 5
    assert "clip_0" in results
    for caps in results.values():
        assert isinstance(caps, list) and isinstance(caps[0], str)


def test_caption_inputs_basename_collision_keys_by_path(trained_ws, tiny_cfg,
                                                        monkeypatch):
    """Two DIFFERENT files sharing a basename both key by FULL path,
    independent of argument order (ADVICE r4: first-seen-wins was
    order-dependent and asymmetric)."""
    monkeypatch.chdir(trained_ws)
    rng = np.random.default_rng(7)
    a = trained_ws / "site_a"; a.mkdir(exist_ok=True)
    b = trained_ws / "site_b"; b.mkdir(exist_ok=True)
    pa, pb = a / "clip.npy", b / "clip.npy"
    T, D = tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim
    np.save(pa, rng.normal(size=(T, D)).astype(np.float32))
    np.save(pb, rng.normal(size=(T, D)).astype(np.float32))
    for order in ([str(pa), str(pb)], [str(pb), str(pa)]):
        out = trained_ws / "caps_coll.json"
        assert main(["caption", "--preset", "synthetic_tiny", "--method",
                     "greedy", "--inputs", *order, "--out", str(out)]) == 0
        results = json.load(open(out))
        assert set(results) == {str(pa), str(pb)}, order


def test_caption_inputs_rejects_unsupported_extension(trained_ws, monkeypatch):
    """An explicitly listed .txt gets the same filter as directory scans
    (ADVICE r4): a clean SystemExit naming the file, not an np.load
    traceback."""
    monkeypatch.chdir(trained_ws)
    bad = trained_ws / "notes.txt"
    bad.write_text("not a feature file")
    with pytest.raises(SystemExit, match="notes.txt"):
        main(["caption", "--preset", "synthetic_tiny",
              "--inputs", str(bad)])


def test_caption_inputs_nbest_beam(trained_ws, tiny_cfg, monkeypatch):
    monkeypatch.chdir(trained_ws)
    d, _ = _write_npy_inputs(trained_ws, tiny_cfg, n=3)
    out = trained_ws / "caps_nbest.json"
    assert main(["caption", "--preset", "synthetic_tiny", "--method", "beam",
                 "--beam", "3", "--nbest", "3",
                 "--inputs", str(d), "--out", str(out)]) == 0
    results = json.load(open(out))
    assert all(len(caps) == 3 for caps in results.values())


def test_caption_inputs_matches_decode_batch(trained_ws, tiny_cfg, monkeypatch):
    """The CLI path is the library path: --inputs greedy tokens == a direct
    Captioner.decode_batch on the same padded batch with the same restored
    checkpoint."""
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.inference import Captioner
    from vidcap_tpu.serving import _pad_batch

    monkeypatch.chdir(trained_ws)
    d, paths = _write_npy_inputs(trained_ws, tiny_cfg, n=4, seed=3)
    out = trained_ws / "caps_parity.json"
    assert main(["caption", "--preset", "synthetic_tiny", "--method", "greedy",
                 "--inputs", str(d), "--out", str(out)]) == 0
    results = json.load(open(out))

    # same dataset the CLI builds (synthetic fallback defaults) → same vocab
    dataset = CaptionDataset.synthetic(tiny_cfg.data)
    cap = Captioner.from_checkpoint(tiny_cfg, dataset,
                                    checkpoint_dir="checkpoints")
    feats = [np.load(p) for p in paths]
    batch, mask = _pad_batch(tiny_cfg, feats, len(paths))
    toks = cap.decode_batch(batch, method="greedy", frame_mask=mask)
    want = [dataset.vocab.decode_str(r) for r in np.asarray(toks)]
    got = [results[f"clip_{i}"][0] for i in range(4)]
    assert got == want


def test_caption_inputs_rejects_missing(tmp_path):
    with pytest.raises(SystemExit):
        main(["caption", "--preset", "synthetic_tiny",
              "--inputs", str(tmp_path / "nope.npy")])


def test_caption_inputs_from_export(trained_ws, tiny_cfg, monkeypatch,
                                    tmp_path):
    """--inputs composes with --from-export (ADVICE r4: the artifact graph
    takes a frame-mask input, so arbitrary .npy features decode AOT):
    captions match the live-model path token-for-token; raw videos and
    --nbest are cleanly rejected in artifact mode."""
    monkeypatch.chdir(trained_ws)
    d, _ = _write_npy_inputs(trained_ws, tiny_cfg, n=4, seed=11)
    exp_dir = str(tmp_path / "artifact")
    assert main(["export", "--preset", "synthetic_tiny", "--out", exp_dir,
                 "--batch", "8", "--method", "greedy"]) == 0
    live, aot = trained_ws / "live.json", trained_ws / "aot.json"
    assert main(["caption", "--preset", "synthetic_tiny", "--method",
                 "greedy", "--inputs", str(d), "--out", str(live)]) == 0
    assert main(["caption", "--preset", "synthetic_tiny",
                 "--from-export", exp_dir,
                 "--inputs", str(d), "--out", str(aot)]) == 0
    assert json.load(open(live)) == json.load(open(aot))
    # raw video input needs the live IRv2 — clean rejection in artifact mode
    fake_vid = trained_ws / "clip.mp4"
    fake_vid.write_bytes(b"\x00")
    with pytest.raises(SystemExit, match="drop\\s+--from-export"):
        main(["caption", "--preset", "synthetic_tiny",
              "--from-export", exp_dir, "--inputs", str(fake_vid)])
    with pytest.raises(SystemExit, match="nbest"):
        main(["caption", "--preset", "synthetic_tiny", "--method", "beam",
              "--nbest", "2", "--from-export", exp_dir, "--inputs", str(d)])


def test_eval_refs_standalone(tmp_path, capsys):
    """--refs bypasses the dataset entirely; a perfect candidate scores 1.0
    BLEU-1 and extra candidates without refs are skipped with a warning."""
    refs = {"v1": ["a man rides a horse", "someone rides"],
            "v2": ["a cat sits on a mat"]}
    res = {"v1": ["a man rides a horse"], "v2": ["a cat sits on a mat"],
           "v_unknown": ["mystery clip"]}
    rp, cp = tmp_path / "refs.json", tmp_path / "caps.json"
    rp.write_text(json.dumps(refs))
    cp.write_text(json.dumps(res))
    assert main(["eval", "--preset", "synthetic_tiny",
                 "--captions", str(cp), "--refs", str(rp)]) == 0
    out = capsys.readouterr()
    scores = json.loads(out.out)
    assert scores["Bleu_1"] == pytest.approx(1.0)
    assert scores["CIDEr"] > 0
    assert "no references" in out.err


def test_eval_refs_no_overlap_errors(tmp_path):
    rp, cp = tmp_path / "refs.json", tmp_path / "caps.json"
    rp.write_text(json.dumps({"a": ["x"]}))
    cp.write_text(json.dumps({"b": ["y"]}))
    with pytest.raises(SystemExit):
        main(["eval", "--preset", "synthetic_tiny",
              "--captions", str(cp), "--refs", str(rp)])


def test_eval_refs_shape_validation(tmp_path, capsys):
    """ADVICE r4 + review r5: malformed --refs dies with a clear SystemExit
    (a bare-string value would be iterated per-character into silent garbage
    scores; a non-dict is a format error), while an EMPTY reference list is
    valid placeholder data — skipped like the dataset branch skips
    partially-captioned rows, fatal only when nothing scorable remains."""
    cp = tmp_path / "caps.json"
    cp.write_text(json.dumps({"v": ["a cat"]}))
    # all-placeholder refs: nothing scorable -> clean SystemExit
    empty = tmp_path / "refs_empty.json"
    empty.write_text(json.dumps({"v": []}))
    with pytest.raises(SystemExit, match="no video ids in common"):
        main(["eval", "--preset", "synthetic_tiny",
              "--captions", str(cp), "--refs", str(empty)])
    bare = tmp_path / "refs_bare.json"
    bare.write_text(json.dumps({"v": "a cat"}))
    with pytest.raises(SystemExit, match="must be a list"):
        main(["eval", "--preset", "synthetic_tiny",
              "--captions", str(cp), "--refs", str(bare)])
    not_dict = tmp_path / "refs_list.json"
    not_dict.write_text(json.dumps([["a cat"]]))
    with pytest.raises(SystemExit, match="json object"):
        main(["eval", "--preset", "synthetic_tiny",
              "--captions", str(cp), "--refs", str(not_dict)])
    # a placeholder row NEXT TO a captioned one scores fine (and is counted
    # in the skipped notice) — the partially-captioned-corpus contract
    cp2 = tmp_path / "caps2.json"
    cp2.write_text(json.dumps({"v": ["a cat"], "w": ["a dog"]}))
    mixed = tmp_path / "refs_mixed.json"
    mixed.write_text(json.dumps({"v": ["a cat plays"], "w": []}))
    rc = main(["eval", "--preset", "synthetic_tiny",
               "--captions", str(cp2), "--refs", str(mixed)])
    assert rc == 0
    out = capsys.readouterr()
    assert "CIDEr" in out.out
    assert "1 candidate video(s) have no references" in out.err
