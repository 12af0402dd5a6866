"""Dataset preparation (data/prepare.py): MSVD CSV + MSR-VTT json → canonical
layout → loadable by CaptionDataset.from_files."""
import dataclasses
import json
import os

import numpy as np

from vidcap_tpu.config import DataConfig
from vidcap_tpu.data.loader import CaptionDataset
from vidcap_tpu.data.prepare import parse_msrvtt_json, parse_msvd_csv, prepare


MSVD_CSV = """VideoID,Start,End,WorkerID,Source,AnnotationTime,Language,Description
vidA,1,10,1,x,1,English,A man is playing a guitar
vidA,1,10,2,x,1,English,Someone plays guitar
vidA,1,10,3,x,1,Spanish,Un hombre toca la guitarra
vidB,5,20,1,x,1,English,A dog runs in the park
"""

MSRVTT_JSON = {
    "videos": [
        {"video_id": "video0", "split": "train"},
        {"video_id": "video1", "split": "validate"},
        {"video_id": "video2", "split": "test"},
    ],
    "sentences": [
        {"video_id": "video0", "caption": "a man is cooking"},
        {"video_id": "video0", "caption": "someone cooks food"},
        {"video_id": "video1", "caption": "a cat jumps"},
        {"video_id": "video2", "caption": "people are dancing"},
    ],
}


def test_parse_msvd(tmp_path):
    p = tmp_path / "msvd.csv"
    p.write_text(MSVD_CSV)
    caps = parse_msvd_csv(str(p))
    assert caps["vidA_1_10"] == ["A man is playing a guitar",
                                 "Someone plays guitar"]  # Spanish dropped
    assert caps["vidB_5_20"] == ["A dog runs in the park"]


def test_parse_msrvtt(tmp_path):
    p = tmp_path / "info.json"
    p.write_text(json.dumps(MSRVTT_JSON))
    caps, splits = parse_msrvtt_json(str(p))
    assert len(caps["video0"]) == 2
    assert splits == {"train": ["video0"], "val": ["video1"],
                      "test": ["video2"]}


def test_prepare_then_load(tmp_path):
    p = tmp_path / "info.json"
    p.write_text(json.dumps(MSRVTT_JSON))
    cfg = DataConfig(dataset="msrvtt", data_dir=str(tmp_path), feature_dim=8,
                     num_frames=2, min_word_count=1)
    prepare(cfg, [str(p)])
    for fname in ("msrvtt_captions.json", "msrvtt_train_ids.json",
                  "msrvtt_vocab.json"):
        assert os.path.exists(tmp_path / fname), fname

    # drop in fake features and load through the standard path
    ids = json.load(open(tmp_path / "msrvtt_train_ids.json"))
    np.save(tmp_path / "msrvtt_train_feats.npy",
            np.zeros((len(ids), 2, 8), np.float32))
    ds = CaptionDataset.from_files(cfg, split="train")
    assert ds.num_videos == 1 and ds.num_captions == 2
    assert "cooking" in ds.vocab.word_to_id
