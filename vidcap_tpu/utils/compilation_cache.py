"""Persistent XLA compilation cache (SURVEY.md §5 observability/infra).

First TPU compiles via the remote-compile tunnel cost 30–60s; enabling JAX's
on-disk compilation cache makes every CLI invocation after the first start in
~seconds. Called from the CLI entry point; opt out with VIDCAP_NO_COMPILE_CACHE=1.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("VIDCAP_NO_COMPILE_CACHE") == "1":
        return
    import jax
    path = path or os.environ.get(
        "VIDCAP_COMPILE_CACHE", os.path.expanduser("~/.cache/vidcap_jax"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob — harmless
