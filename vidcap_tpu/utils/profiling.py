"""Tracing / profiling hooks (SURVEY.md §5 "Tracing / profiling").

The reference has none; here: ``jax.profiler`` traces around any code region,
named scopes on the decoder hot loops, and an optional trace-server for live
TensorBoard/Perfetto attachment.
"""
from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    """Capture an xplane trace of the enclosed region (TensorBoard/Perfetto)."""
    trace_dir = trace_dir or os.environ.get("VIDCAP_TRACE_DIR")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


def start_server(port: int = 9999) -> None:
    """Live profiler server for `tensorboard --logdir` capture."""
    jax.profiler.start_server(port)


def annotate(name: str):
    """Named scope for decoder/step regions — shows up in traces."""
    return jax.named_scope(name)


def enable_nan_debugging() -> None:
    """Dev-config invariant checking (SURVEY.md §5 "race detection / sanitizers"
    row): XLA is deterministic dataflow, so the useful runtime check is NaN
    detection on every jitted output."""
    jax.config.update("jax_debug_nans", True)
