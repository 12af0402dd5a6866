"""Structured metrics logging (SURVEY.md §5 "Metrics / logging / observability").

Per-step scalars go to stdout + a jsonl artifact; the reference used bare ``print``.
"""
from __future__ import annotations

import json
import sys
import time
from typing import Dict, Optional


def _to_float(v) -> float:
    if hasattr(v, "item"):
        return float(v.item())
    return float(v)


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, quiet: bool = False,
                 tensorboard_dir: Optional[str] = None):
        self._f = open(path, "a") if path else None
        self.quiet = quiet
        self._t0 = time.time()
        self._tb = None
        tensorboard_dir = tensorboard_dir or __import__("os").environ.get(
            "VIDCAP_TB_DIR")
        if tensorboard_dir:
            try:
                import tensorflow as tf  # environment-provided, host-only
                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, object], prefix: str = "train"
            ) -> None:
        row = {"step": int(step), "wall_s": round(time.time() - self._t0, 3),
               "prefix": prefix}
        row.update({k: _to_float(v) for k, v in metrics.items()})
        if self._f:
            self._f.write(json.dumps(row) + "\n")
            self._f.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in row.items():
                    if isinstance(v, float):
                        tf.summary.scalar(f"{prefix}/{k}", v, step=int(step))
        if not self.quiet:
            kv = " ".join(f"{k}={row[k]:.4g}" for k in metrics)
            print(f"[{prefix} {step}] {kv}", file=sys.stderr)

    def close(self) -> None:
        if self._f:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
