"""Preset preflight census for the CLI `info` subcommand.

Parameter counts come from ``jax.eval_shape`` over the REAL ``model.init`` —
zero FLOPs, zero allocation — so `info` answers instantly even for the
76M-param pixel presets. Memory numbers are loud ROUGH estimates of the
dominant live buffers (the same model as the pre-flight guard in
scripts/bench_e2e_preset.py), not an XLA accounting: their job is catching
"this preset cannot fit this chip" before a 30-minute remote compile, and
sizing batch/grad_accum knobs.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def param_census(cfg, vocab_size: int | None = None) -> Dict[str, int]:
    """{top-level param group: parameter count} + '_total', without ever
    materializing a weight."""
    from vidcap_tpu.models.model import VidCapModel, create_model

    model = create_model(cfg, vocab_size=vocab_size or cfg.data.vocab_size)
    B, T = 2, cfg.data.num_frames
    if cfg.model.use_backbone:
        inputs = jax.ShapeDtypeStruct(
            (B, T, cfg.data.frame_size, cfg.data.frame_size, 3), jnp.float32)
    else:
        inputs = jax.ShapeDtypeStruct((B, T, cfg.data.feature_dim),
                                      jnp.float32)
    token = jax.ShapeDtypeStruct((B,), jnp.int32)

    def init(rng, x, tok):
        return model.init(rng, x, None, tok, method=VidCapModel.init_all)

    shapes = jax.eval_shape(init, jax.random.key(0), inputs, token)["params"]
    census = {
        group: sum(int(math.prod(leaf.shape))
                   for leaf in jax.tree_util.tree_leaves(sub))
        for group, sub in shapes.items()
    }
    census["_total"] = sum(census.values())
    return census


def train_memory_estimate(cfg, n_params: int) -> Dict[str, float]:
    """Rough dominant-buffer HBM bytes for one train step at the preset's
    (micro)batch. Pixel presets reuse the IRv2 remat-boundary activation model
    that gated the measured e2e runs; feature presets count the XE logits +
    grad buffer (the only activation of consequence at T<=45, L<=30)."""
    B = max(1, cfg.train.batch_size // max(1, cfg.train.grad_accum))
    T, L = cfg.data.num_frames, cfg.data.max_caption_len
    pv = cfg.data.padded_vocab
    params = n_params * 4.0              # f32 master
    adam = n_params * 8.0                # m + v
    grads = n_params * 4.0
    if cfg.model.use_backbone:
        S = cfg.data.frame_size
        frames = B * T
        stem = 147 * 147 * 32 + 73 * 73 * 80 + 35 * 35 * 320
        saved = (10 * 35 * 35 * 320 + 20 * 17 * 17 * 1088
                 + 10 * 8 * 8 * 2080)    # remat-boundary block inputs
        acts = frames * (stem + saved) * 4.0
        inputs = frames * S * S * 3 * 4.0
    else:
        acts = B * L * pv * 8.0          # XE logits f32 + their grad
        inputs = B * T * cfg.data.feature_dim * 4.0
    total = params + adam + grads + acts + inputs
    return {"params": params, "optimizer": adam, "grads": grads,
            "activations": acts, "inputs": inputs, "total": total}


def decode_buffer_estimate(cfg) -> Dict[str, float]:
    """The serving-side buffer that sets the beam batch's VMEM cliff: the
    [B*K, padded_vocab] per-step logits (bf16 on the serving path)."""
    B, K = cfg.train.batch_size, cfg.decode.beam_width
    pv = cfg.data.padded_vocab
    itemsize = 2 if cfg.model.compute_dtype == "bfloat16" else 4
    return {"beam_logits_rows": float(B * K), "padded_vocab": float(pv),
            "beam_logits_bytes": float(B * K * pv * itemsize)}


def compile_cache_stats() -> Dict[str, float]:
    import os
    path = os.environ.get("VIDCAP_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/vidcap_jax"))
    if not os.path.isdir(path):
        return {"path": path, "entries": 0, "bytes": 0}
    entries, size = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            entries += 1
            try:
                size += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return {"path": path, "entries": entries, "bytes": size}
