"""cmd_caption/_load_dataset split fallback: corpora with no test split must
evaluate on val (NOT silently drop to the synthetic fixture, which builds the
model at the wrong vocab and then fails checkpoint restore with a confusing
orbax structure error — found driving the at-scale corpus, r4)."""
import dataclasses
import json

import numpy as np

from vidcap_tpu.cli.main import _load_dataset


def _write_corpus(d, splits=("train", "val")):
    caps = {}
    for i, split in enumerate(splits):
        n = 6
        feats = np.random.default_rng(i).normal(
            size=(n, 4, 8)).astype(np.float32)
        ids = [f"{split}_vid{j}" for j in range(n)]
        np.save(d / f"toy_{split}_feats.npy", feats)
        (d / f"toy_{split}_ids.json").write_text(json.dumps(ids))
        for v in ids:
            caps[v] = [f"a {split} caption about video"]
    (d / "toy_captions.json").write_text(json.dumps(caps))


def _cfg(tiny_cfg, d):
    return dataclasses.replace(
        tiny_cfg, data=dataclasses.replace(
            tiny_cfg.data, dataset="toy", data_dir=str(d),
            num_frames=4, feature_dim=8))


def test_test_split_falls_back_to_val(tmp_path, tiny_cfg, capsys):
    _write_corpus(tmp_path, splits=("train", "val"))
    ds = _load_dataset(_cfg(tiny_cfg, tmp_path), split="test")
    assert ds.video_ids[0].startswith("val_")
    assert "using 'val'" in capsys.readouterr().err


def test_real_test_split_preferred(tmp_path, tiny_cfg):
    _write_corpus(tmp_path, splits=("train", "val", "test"))
    ds = _load_dataset(_cfg(tiny_cfg, tmp_path), split="test")
    assert ds.video_ids[0].startswith("test_")


def test_no_assets_still_synthetic(tiny_cfg, tmp_path):
    ds = _load_dataset(_cfg(tiny_cfg, tmp_path), split="test")
    assert ds.num_videos > 0   # synthetic fixture fallback preserved
