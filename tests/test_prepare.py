"""Dataset preparation (data/prepare.py): MSVD CSV + MSR-VTT json → canonical
layout → loadable by CaptionDataset.from_files."""
import dataclasses
import json
import os

import numpy as np

from vidcap_tpu.config import DataConfig
from vidcap_tpu.data.loader import CaptionDataset
from vidcap_tpu.data.prepare import (parse_msrvtt_json, parse_msvd_csv,
                                     parse_msvd_mapping, prepare)


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


def test_msvd_canonical_mapping_split(tmp_path):
    """The canonical MSVD split is by the youtube_mapping.txt vid1..vid1970
    ordering (1200/100/670), NOT lexicographic caption-key order — and
    caption-less videos must not shift the split boundaries."""
    n = 1970
    # keys deliberately ordered so lexicographic != vidN order
    keys = [f"yt{(n - i):04d}_0_{i + 1}" for i in range(n)]
    csv_lines = ["VideoID,Start,End,Language,Description"]
    for i, k in enumerate(keys):
        vid, s, e = k.rsplit("_", 2)
        if i in (4, 1204):       # two caption-less videos (one train, one val)
            continue
        csv_lines.append(f"{vid},{s},{e},English,a man is running number {i}")
    csv_p = tmp_path / "msvd.csv"
    csv_p.write_text("\n".join(csv_lines) + "\n")
    map_p = tmp_path / "youtube_mapping.txt"
    map_p.write_text("".join(f"{k} vid{i + 1}\n" for i, k in enumerate(keys)))

    assert parse_msvd_mapping(str(map_p))[keys[0]] == 1

    cfg = DataConfig(dataset="msvd", data_dir=str(tmp_path), feature_dim=8,
                     num_frames=2, min_word_count=1)
    prepare(cfg, [str(csv_p)], mapping=str(map_p))
    splits = {s: json.load(open(tmp_path / f"msvd_{s}_ids.json"))
              for s in ("train", "val", "test")}
    # boundaries fixed by vid index: dropping vid5/vid1205 shrinks their own
    # split only
    assert [len(splits[s]) for s in ("train", "val", "test")] == [1199, 99, 670]
    assert splits["train"][0] == keys[0]          # vid1, not lexicographic min
    assert splits["val"][0] == keys[1200]         # vid1201
    assert splits["test"][-1] == keys[-1]         # vid1970
    assert keys[4] not in splits["train"]


def test_loader_tolerates_captionless_videos(tmp_path):
    """from_files: MSR-VTT test-server style videos with zero sentences load
    with empty reference lists instead of a KeyError (ADVICE r1)."""
    cfg = DataConfig(dataset="msrvtt", data_dir=str(tmp_path), feature_dim=8,
                     num_frames=2, min_word_count=1)
    json.dump({"videoA": ["a man is cooking"]},
              open(tmp_path / "msrvtt_captions.json", "w"))
    json.dump(["videoA", "videoB"],
              open(tmp_path / "msrvtt_test_ids.json", "w"))
    np.save(tmp_path / "msrvtt_test_feats.npy",
            np.zeros((2, 2, 8), np.float32))
    ds = CaptionDataset.from_files(cfg, split="test")
    assert ds.num_videos == 2
    assert ds.video_captions["videoB"] == []
    assert ds.tokens.ndim == 2


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
