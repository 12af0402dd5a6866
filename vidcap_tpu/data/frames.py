"""Frame extraction + on-device preprocessing (SURVEY.md C1, C3).

Split of responsibilities (SURVEY.md §2.2 native-components table):
  * Host: video file decode stays native — OpenCV's C++ codecs via cv2 (gated:
    everything else works without it).
  * Device: frame sampling, resize, crop and normalization are jitted XLA ops
    (BASELINE.json north_star: "video frame sampling and CNN feature extraction
    ... compile to XLA"), so the e2e train graph consumes raw uint8 frames.
"""
from __future__ import annotations

import json
import os
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from vidcap_tpu.config import Config

Array = jax.Array


def uniform_frame_indices(total: int, num: int) -> np.ndarray:
    """The reference lineage's uniform sampling: num evenly-spaced indices."""
    if total <= 0:
        return np.zeros((num,), np.int64)
    return np.linspace(0, max(total - 1, 0), num).round().astype(np.int64)


# --------------------------------------------------------------------- device ops

@partial(jax.jit, static_argnames=("out_size",))
def preprocess_frames(frames_u8: Array, out_size: int = 299) -> Array:
    """uint8[T, H, W, 3] → f32[T, out, out, 3] in [-1, 1] (IRv2 convention).

    Bilinear resize + scale happen on-device; one transfer of raw bytes, no host
    float blow-up (SURVEY.md L3 → on-device preprocessing).
    """
    x = frames_u8.astype(jnp.float32) / 255.0
    x = jax.image.resize(
        x, (x.shape[0], out_size, out_size, x.shape[3]), method="bilinear")
    return x * 2.0 - 1.0


@partial(jax.jit, static_argnames=("num_frames",))
def sample_frames_device(frames: Array, num_frames: int) -> Array:
    """[T_in, ...] → uniformly-sampled [num_frames, ...] as a gather (XLA op)."""
    t_in = frames.shape[0]
    idx = jnp.clip(
        jnp.round(jnp.linspace(0.0, t_in - 1.0, num_frames)).astype(jnp.int32),
        0, t_in - 1)
    return frames[idx]


# --------------------------------------------------------------------- host decode

def decode_video_frames(path: str, num_frames: int) -> np.ndarray:
    """Decode a video file and uniformly sample frames → uint8[num_frames, H, W, 3].

    Host-side native decode via OpenCV's C++ codecs (SURVEY.md C1)."""
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "video decode requires OpenCV (cv2); precomputed-feature mode works "
            "without it") from e
    cap = cv2.VideoCapture(path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    # CAP_PROP_FRAME_COUNT is a container hint, not a guarantee — some codecs
    # report 0 (or junk). When unreliable, decode everything and sample after.
    want = (set(uniform_frame_indices(total, num_frames).tolist())
            if total > 0 else None)
    frames: List[np.ndarray] = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if want is None or i in want:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        i += 1
    cap.release()
    if not frames:
        raise RuntimeError(f"no frames decoded from {path}")
    if want is None and len(frames) > num_frames:
        idx = uniform_frame_indices(len(frames), num_frames)
        frames = [frames[j] for j in idx.tolist()]
    while len(frames) < num_frames:      # short/corrupt videos: repeat last
        frames.append(frames[-1])
    return np.stack(frames[:num_frames])


# --------------------------------------------------------------------- extraction

def extract_features_for_dir(cfg: Config, video_dir: str, split: str = "train",
                             batch_videos: int = 8, fmt: str = "npy") -> None:
    """Feature precomputation (SURVEY.md C3): decode every video in ``video_dir``,
    run the CNN backbone, write {dataset}_{split}_feats.{fmt} + ids json.
    ``fmt`` ∈ {npy, h5, tfrecord} — the three dump formats the reference
    lineage used (SURVEY.md §2.1 C3)."""
    from vidcap_tpu.models.backbone import InceptionResNetV2, load_backbone_params

    exts = (".mp4", ".avi", ".mkv", ".webm", ".mov")
    files = sorted(f for f in os.listdir(video_dir) if f.lower().endswith(exts))
    if not files:
        raise FileNotFoundError(f"no videos in {video_dir}")

    backbone = InceptionResNetV2()
    params = load_backbone_params(backbone, cfg)

    @jax.jit
    def encode(frames_u8):
        x = preprocess_frames(frames_u8, cfg.data.frame_size)
        return backbone.apply({"params": params}, x)

    feats, ids = [], []
    for f in files:
        frames = decode_video_frames(os.path.join(video_dir, f),
                                     cfg.data.num_frames)
        feats.append(np.asarray(encode(jnp.asarray(frames))))
        ids.append(os.path.splitext(f)[0])

    os.makedirs(cfg.data.data_dir, exist_ok=True)
    base = os.path.join(cfg.data.data_dir, f"{cfg.data.dataset}_{split}")
    from vidcap_tpu.data.feature_io import save_features
    path = save_features(base + "_feats", np.stack(feats), ids, fmt=fmt)
    with open(base + "_ids.json", "w") as fp:
        json.dump(ids, fp)
    print(f"[vidcap] wrote {len(ids)} feature rows → {path}")
