"""Minimal serving loop (BASELINE.json: "intended for large-scale production
deployment and serving").

Reads inputs line-by-line from a stream (feature ``.npy`` files of shape [T, D],
or video files when OpenCV + backbone weights are available), micro-batches them
to the compiled decode batch size, and emits ``path\tcaption`` lines. One jitted
decode per flushed batch; padding rows fill partial batches (static shapes).
"""
from __future__ import annotations

import os
import sys
from typing import IO, List, Optional

import numpy as np

from vidcap_tpu.config import Config

_VIDEO_EXTS = (".mp4", ".avi", ".mkv", ".webm", ".mov")


class CaptionServer:
    def __init__(self, cfg: Config, captioner, batch_size: int = 32,
                 method: str = "greedy", beam_width: int = 5):
        self.cfg = cfg
        self.captioner = captioner
        self.batch_size = batch_size
        self.method = method
        self.beam_width = beam_width
        self._backbone = None

    # ------------------------------------------------------------ input loading

    def _load_features(self, path: str) -> np.ndarray:
        if path.lower().endswith(_VIDEO_EXTS):
            from vidcap_tpu.data.frames import (decode_video_frames,
                                                preprocess_frames)
            frames = decode_video_frames(path, self.cfg.data.num_frames)
            if self._backbone is None:
                from vidcap_tpu.models.backbone import (InceptionResNetV2,
                                                        load_backbone_params)
                bb = InceptionResNetV2()
                self._backbone = (bb, load_backbone_params(bb, self.cfg))
            import jax
            import jax.numpy as jnp
            bb, params = self._backbone
            x = preprocess_frames(jnp.asarray(frames),
                                  self.cfg.data.frame_size)
            return np.asarray(bb.apply({"params": params}, x))
        feats = np.load(path)
        if feats.ndim != 2:
            raise ValueError(f"{path}: expected [T, D] features, "
                             f"got {feats.shape}")
        D = self.cfg.data.feature_dim
        if feats.shape[1] != D:
            raise ValueError(f"{path}: feature dim {feats.shape[1]} != "
                             f"configured {D}")
        return feats.astype(np.float32)

    # ------------------------------------------------------------ serving loop

    def _flush(self, paths: List[str], feats: List[np.ndarray],
               out: IO) -> None:
        if not paths:
            return
        n = len(paths)
        T, D = self.cfg.data.num_frames, self.cfg.data.feature_dim
        batch = np.zeros((self.batch_size, T, D), np.float32)
        # frame_mask marks the t real frames so attention + the pooled decoder
        # init ignore zero-padding (short inputs AND all-zero filler rows)
        mask = np.zeros((self.batch_size, T), np.float32)
        for i, f in enumerate(feats):
            t = min(f.shape[0], T)
            batch[i, :t] = f[:t]
            mask[i, :t] = 1.0
        toks = self.captioner.decode_batch(
            batch, method=self.method, beam_width=self.beam_width,
            frame_mask=mask)
        vocab = self.captioner.dataset.vocab
        for i in range(n):
            out.write(f"{paths[i]}\t{vocab.decode_str(toks[i])}\n")
        out.flush()

    def run(self, inp: Optional[IO] = None, out: Optional[IO] = None) -> int:
        inp = inp or sys.stdin
        out = out or sys.stdout
        paths: List[str] = []
        feats: List[np.ndarray] = []
        served = 0
        for line in inp:
            path = line.strip()
            if not path:
                continue
            try:
                feats.append(self._load_features(path))
                paths.append(path)
            except Exception as e:
                print(f"[vidcap] skip {path}: {e}", file=sys.stderr)
                continue
            if len(paths) == self.batch_size:
                self._flush(paths, feats, out)
                served += len(paths)
                paths, feats = [], []
        self._flush(paths, feats, out)
        served += len(paths)
        print(f"[vidcap] served {served} captions", file=sys.stderr)
        return served
