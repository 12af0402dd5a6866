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
    # mix a directory with an explicit file list (the file is also in the
    # dir → its second occurrence keys by full path, no silent overwrite)
    assert main(["caption", "--preset", "synthetic_tiny", "--method", "greedy",
                 "--inputs", str(d), str(paths[0]), "--out", str(out)]) == 0
    results = json.load(open(out))
    assert len(results) == 6
    assert "clip_0" in results and str(paths[0]) in results
    assert results[str(paths[0])] == results["clip_0"]
    for caps in results.values():
        assert isinstance(caps, list) and isinstance(caps[0], str)


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


def test_caption_inputs_rejects_missing_and_from_export(tmp_path):
    with pytest.raises(SystemExit):
        main(["caption", "--preset", "synthetic_tiny",
              "--inputs", str(tmp_path / "nope.npy")])
    with pytest.raises(SystemExit):
        main(["caption", "--preset", "synthetic_tiny",
              "--inputs", str(tmp_path), "--from-export", str(tmp_path)])


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
