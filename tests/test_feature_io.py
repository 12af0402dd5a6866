"""Feature-container IO (SURVEY.md C3: the reference dumps features to
npy/h5/tfrecord). Round-trips each format, the id-reorder contract, the wild
per-video-dataset h5 layout, and CaptionDataset.from_files picking up every
container — including id-less loads for formats that embed ids."""
import json
import os

import numpy as np
import pytest

from vidcap_tpu.data.feature_io import (load_features, resolve_feature_path,
                                        save_features)
from vidcap_tpu.data.loader import CaptionDataset


def _feats(n=4, t=3, d=5, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, t, d)).astype(np.float32)


IDS = ["vid3", "vid1", "vid0", "vid2"]


def test_npy_round_trip(tmp_path):
    base = str(tmp_path / "x_feats")
    f = _feats()
    path = save_features(base, f, IDS, fmt="npy")
    assert path.endswith(".npy")
    out, ids = load_features(path)
    np.testing.assert_array_equal(out, f)
    assert ids is None  # npy embeds no ids


def test_h5_round_trip_and_reorder(tmp_path):
    h5py = pytest.importorskip("h5py")  # noqa: F841
    base = str(tmp_path / "x_feats")
    f = _feats()
    path = save_features(base, f, IDS, fmt="h5")
    out, ids = load_features(path)
    np.testing.assert_array_equal(out, f)
    assert ids == IDS
    # request a different order: rows must follow the requested ids
    want = ["vid0", "vid1", "vid2", "vid3"]
    out2, ids2 = load_features(path, video_ids=want)
    assert ids2 == want
    for i, v in enumerate(want):
        np.testing.assert_array_equal(out2[i], f[IDS.index(v)])
    with pytest.raises(KeyError):
        load_features(path, video_ids=["vid0", "nope"])


def test_h5_per_video_dataset_layout(tmp_path):
    """Files in the wild often key one dataset per video id."""
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "wild.h5")
    f = _feats()
    with h5py.File(path, "w") as h:
        for vid, row in zip(IDS, f):
            h.create_dataset(vid, data=row)
    out, ids = load_features(path, video_ids=IDS)
    np.testing.assert_array_equal(out, f)
    # no ids given → sorted key order
    out2, ids2 = load_features(path)
    assert ids2 == sorted(IDS)


def test_resolve_prefers_npy(tmp_path):
    pytest.importorskip("h5py")
    base = str(tmp_path / "x_feats")
    save_features(base, _feats(seed=1), IDS, fmt="h5")
    save_features(base, _feats(seed=2), IDS, fmt="npy")
    assert resolve_feature_path(base).endswith(".npy")
    with pytest.raises(FileNotFoundError):
        resolve_feature_path(str(tmp_path / "missing"))


def _write_dataset_sidecars(tmp_path, ids, with_ids_json=True):
    caps = {v: [f"a cat number {i} runs"] for i, v in enumerate(ids)}
    with open(tmp_path / "unit_captions.json", "w") as fp:
        json.dump(caps, fp)
    if with_ids_json:
        with open(tmp_path / "unit_train_ids.json", "w") as fp:
            json.dump(ids, fp)


def _tiny_data_cfg(tmp_path, tiny_cfg):
    import dataclasses
    return dataclasses.replace(
        tiny_cfg.data, data_dir=str(tmp_path), dataset="unit")


def test_from_files_reads_h5_without_ids_json(tmp_path, tiny_cfg):
    pytest.importorskip("h5py")
    f = _feats(t=tiny_cfg.data.num_frames, d=tiny_cfg.data.feature_dim)
    save_features(str(tmp_path / "unit_train_feats"), f, IDS, fmt="h5")
    _write_dataset_sidecars(tmp_path, IDS, with_ids_json=False)
    ds = CaptionDataset.from_files(_tiny_data_cfg(tmp_path, tiny_cfg), "train")
    assert ds.video_ids == IDS
    np.testing.assert_array_equal(ds.features, f)


def test_from_files_npy_requires_ids_json(tmp_path, tiny_cfg):
    f = _feats(t=tiny_cfg.data.num_frames, d=tiny_cfg.data.feature_dim)
    save_features(str(tmp_path / "unit_train_feats"), f, IDS, fmt="npy")
    _write_dataset_sidecars(tmp_path, IDS, with_ids_json=False)
    with pytest.raises(FileNotFoundError):
        CaptionDataset.from_files(_tiny_data_cfg(tmp_path, tiny_cfg), "train")
    # with the sidecar it loads
    _write_dataset_sidecars(tmp_path, IDS, with_ids_json=True)
    ds = CaptionDataset.from_files(_tiny_data_cfg(tmp_path, tiny_cfg), "train")
    np.testing.assert_array_equal(ds.features, f)


# ----------------------------------------------------------------- tfrecord
# TensorFlow import alone costs >60 s on this 1-core host → slow tier.

@pytest.mark.slow
def test_tfrecord_round_trip_and_loader(tmp_path, tiny_cfg):
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    f = _feats(t=tiny_cfg.data.num_frames, d=tiny_cfg.data.feature_dim)
    base = str(tmp_path / "unit_train_feats")
    path = save_features(base, f, IDS, fmt="tfrecord")
    out, ids = load_features(path)
    np.testing.assert_array_equal(out, f)
    assert ids == IDS
    # reorder contract
    want = list(reversed(IDS))
    out2, _ = load_features(path, video_ids=want)
    for i, v in enumerate(want):
        np.testing.assert_array_equal(out2[i], f[IDS.index(v)])
    # loader end-to-end, ids embedded in the container only
    _write_dataset_sidecars(tmp_path, IDS, with_ids_json=False)
    ds = CaptionDataset.from_files(_tiny_data_cfg(tmp_path, tiny_cfg), "train")
    assert ds.video_ids == IDS
    np.testing.assert_array_equal(ds.features, f)


@pytest.mark.slow
def test_tfrecord_uint8_frames_round_trip(tmp_path):
    """e2e frame files: uint8 pixels stay bytes (no float blow-up) and the
    frame loader's [-1, 1] rescale sees real uint8 back."""
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(2, 3, 8, 8, 3)).astype(np.uint8)
    path = save_features(str(tmp_path / "f_frames"), frames, ["a", "b"],
                         fmt="tfrecord")
    assert os.path.getsize(path) < 2 * frames.nbytes  # bytes, not float32
    out, ids = load_features(path)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, frames)
    assert ids == ["a", "b"]


def test_resolve_warns_on_conflicting_containers(tmp_path, capsys):
    """Two containers for one split (stale re-extract) must be announced,
    not silently resolved to the older format (review r4)."""
    pytest.importorskip("h5py")
    base = str(tmp_path / "x_feats")
    save_features(base, _feats(seed=1), IDS, fmt="h5")
    save_features(base, _feats(seed=2), IDS, fmt="npy")
    assert resolve_feature_path(base).endswith(".npy")
    assert "WARNING" in capsys.readouterr().err


@pytest.mark.slow
def test_tfrecord_missing_video_id_is_an_error(tmp_path):
    """A record without video_id must fail loudly — fabricating an id would
    silently mispair rows with captions (review r4)."""
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "bad.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        w.write(tf.train.Example(features=tf.train.Features(feature={
            "shape": tf.train.Feature(
                int64_list=tf.train.Int64List(value=[2])),
            "features": tf.train.Feature(
                float_list=tf.train.FloatList(value=[1.0, 2.0])),
        })).SerializeToString())
    with pytest.raises(ValueError, match="video_id"):
        load_features(path)
