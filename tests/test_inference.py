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
