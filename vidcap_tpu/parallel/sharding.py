"""Sharded train/decode steps over a TPU mesh (SURVEY.md §2.3).

Pure GSPMD: we annotate shardings on inputs/params and let XLA insert the
collectives (grad reduction = ``psum`` over ICI on the ``data`` axis; vocab-TP
matmuls get ``all_gather``/``reduce_scatter`` as needed on ``model``) — the
TPU-native replacement for the reference's (nonexistent) NCCL story.

Layout policy
  * batch leaves:   P('data', ...)          — one video/caption shard per DP group
  * params:         replicated, EXCEPT the vocab-dim TP seam when the mesh has a
    model axis > 1: embedding [V, E] → P('model', None); out_proj kernel
    [H, V] → P(None, 'model'); out_proj bias [V] → P('model').
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vidcap_tpu.config import Config
from vidcap_tpu.models.model import VidCapModel
from vidcap_tpu.train.state import TrainState


# ----------------------------------------------------------------- spec builders

def batch_spec() -> P:
    return P("data")


def param_specs(params: Any, mesh: Mesh) -> Any:
    """Partition-spec tree for the parameter pytree: replicated everywhere except
    the vocab-sharded embedding/out_proj when the model axis is >1."""
    tp = mesh.shape.get("model", 1) > 1

    def spec_for(path, leaf) -> P:
        if not tp:
            return P()
        keys = [getattr(k, "key", str(k)) for k in path]
        if "embed" in keys and keys[-1] == "embedding":
            return P("model", None)
        if "out_proj" in keys and keys[-1] == "kernel":
            return P(None, "model")
        if "out_proj" in keys and keys[-1] == "bias":
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_specs(params, mesh),
        is_leaf=lambda x: isinstance(x, P))


def _put_global(x, sharding: NamedSharding):
    """Place a host/device value onto a (possibly multi-process) sharding.

    Single-process: plain ``jax.device_put`` (fastest path, unchanged).
    Multi-process (``jax.distributed`` initialized — SURVEY.md §2.3
    multi-host): the mesh spans non-addressable devices, which device_put
    rejects; build the global array from the value each process holds via
    ``make_array_from_callback``. Callers guarantee the value is identical
    on every process (params from one seed, the deterministic batch stream) —
    each process materializes exactly its addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    import numpy as np
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    sh = NamedSharding(mesh, batch_spec())
    return {k: _put_global(v, sh) for k, v in batch.items()}


def place_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the train state: params per the TP rules, everything else
    replicated. Optimizer moments inherit the param shardings through GSPMD
    propagation on the first jitted update. Works in single-process AND
    multi-process (jax.distributed) runs — see :func:`_put_global`."""
    param_sh = param_shardings(state.params, mesh)
    repl = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        rng = jax.device_put(state.rng, repl)
    else:
        # PRNG keys carry an opaque dtype make_array_from_callback can't
        # build; round-trip through key_data
        rng = jax.random.wrap_key_data(
            _put_global(jax.random.key_data(state.rng), repl))
    return state.replace(
        step=_put_global(state.step, repl),
        params=jax.tree_util.tree_map(_put_global, state.params, param_sh),
        opt_state=jax.tree_util.tree_map(
            lambda x: _put_global(x, repl), state.opt_state),
        rng=rng,
    )


# ----------------------------------------------------------------- sharded steps

def make_sharded_step(cfg: Config, mesh: Mesh, base_step: Callable) -> Callable:
    """Wrap ANY train-step body with GSPMD shardings: batch over 'data', params
    per the TP rules. ``base_step`` is the unjitted step body
    (state, batch) → (state, metrics) — XE, e2e, and SCST bodies all work."""
    batch_sh = NamedSharding(mesh, batch_spec())

    def run(state: TrainState, batch: Dict[str, jax.Array]):
        batch = {k: jax.lax.with_sharding_constraint(v, batch_sh)
                 for k, v in batch.items()}
        return base_step(state, batch)

    return jax.jit(run, donate_argnums=(0,) if cfg.train.donate_state else ())


def make_sharded_banked_step(cfg: Config, mesh: Mesh, body: Callable,
                             dataset, banks=None):
    """Sharded training with the device feature bank
    (``--feature-bank --sharded``): the whole feature/attribute tensors are
    REPLICATED across the mesh (one HBM copy per chip — e.g. 800 MB of a
    16 GB v5e; replication keeps every gather chip-local, so no collectives
    ride the gather), while the per-step token batch and ``video_idx`` shard
    over the data axis. Each DP group gathers exactly its own batch rows
    from its local bank copy; grads still psum over ICI as in
    :func:`make_sharded_step`. Numerics match the non-banked sharded step
    bit-for-bit (same rows, same order — tests/test_feature_bank.py).

    Returns ``(step_fn, banks)`` like the single-device banked builders."""
    from vidcap_tpu.train.steps import _banked_apply, _build_banks

    repl = NamedSharding(mesh, P())
    banks = _build_banks(dataset, banks, sharding=repl)
    banked = _banked_apply(body)
    batch_sh = NamedSharding(mesh, batch_spec())

    def run(state: TrainState, batch: Dict[str, jax.Array],
            bank_feats: jax.Array, bank_attrs: jax.Array):
        batch = {k: jax.lax.with_sharding_constraint(v, batch_sh)
                 for k, v in batch.items()}
        bank_feats = jax.lax.with_sharding_constraint(bank_feats, repl)
        bank_attrs = jax.lax.with_sharding_constraint(bank_attrs, repl)
        return banked(state, batch, bank_feats, bank_attrs)

    jitted = jax.jit(run, donate_argnums=(0,)
                     if cfg.train.donate_state else ())

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        return jitted(state, batch, banks["features"], banks["attributes"])

    return step_fn, banks


def make_sharded_xe_step(model: VidCapModel, cfg: Config, mesh: Mesh,
                         base_step: Callable) -> Callable:
    """Back-compat name for :func:`make_sharded_step` (the wrapper is
    objective-agnostic; ``model`` is unused)."""
    return make_sharded_step(cfg, mesh, base_step)


def make_sharded_decode(model: VidCapModel, cfg: Config, mesh: Mesh,
                        method: str = "beam",
                        beam_width: int = 5) -> Callable:
    """Multi-chip serving (SURVEY.md §2.3 applied to inference): one jitted
    decode with the video batch sharded over the 'data' axis — every chip
    decodes its own shard of videos, collectives only where the vocab-TP seam
    demands them. Returns ``fn(params, feats [B, T, D]) → tokens i32[B, L]``;
    B must divide by the data-axis size.

    The beam path keeps the full per-video K-row block inside one shard (rows
    are laid out video-major, B·K = data-sharded B × replicated K), so the
    per-step beam gathers never cross chips. Honors cfg.decode.finished_pool
    (same auto rule as the Captioner)."""
    from vidcap_tpu.models.decoding import (beam_decode, beam_decode_pool,
                                            greedy_decode, tile_recurrent,
                                            use_finished_pool)

    feats_sh = NamedSharding(mesh, P("data"))
    max_len = cfg.decode.max_len
    bf16 = cfg.model.compute_dtype == "bfloat16"

    def run(params, feats, frame_mask=None):
        feats = jax.lax.with_sharding_constraint(feats, feats_sh)
        if frame_mask is not None:
            frame_mask = jax.lax.with_sharding_constraint(frame_mask, feats_sh)
        B = feats.shape[0]
        state = model.apply({"params": params}, feats, frame_mask,
                            method=VidCapModel.init_state)
        if method == "greedy":
            def step(st, tok):
                return model.apply({"params": params}, st, tok, bf16,
                                   method=VidCapModel.step)
            return greedy_decode(step, state, B, max_len,
                                 early_exit=cfg.decode.early_exit,
                                 with_logp=False).tokens
        state = tile_recurrent(state, beam_width)

        if cfg.decode.int8_vocab_projection:
            # same opt-in int8 MXU projection as the single-device beam
            # (inference.py) — quantization traced from params, hoisted out
            # of the scan by XLA; see ops/int8_proj.py for the quality data
            from vidcap_tpu.ops.int8_proj import (int8_logits,
                                                  quantize_out_proj)
            W8, wscale, bq = quantize_out_proj(params, model.vocab_size)

            def beam_step(st, tok):
                st2, h = model.apply({"params": params}, st, tok, beam_width,
                                     method=VidCapModel.step_beam_hidden)
                return st2, int8_logits(h, W8, wscale, bq)
        else:
            def beam_step(st, tok):
                return model.apply({"params": params}, st, tok, beam_width,
                                   bf16, method=VidCapModel.step_beam)

        decode_fn = (beam_decode_pool if use_finished_pool(cfg.decode)
                     else beam_decode)
        toks, _ = decode_fn(beam_step, state, batch=B, max_len=max_len,
                            beam_width=beam_width,
                            length_penalty=cfg.decode.length_penalty,
                            early_exit=cfg.decode.early_exit)
        return toks

    return jax.jit(run)
