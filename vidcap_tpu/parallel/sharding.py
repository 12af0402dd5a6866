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


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    sh = NamedSharding(mesh, batch_spec())
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def place_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Device-put the train state: params per the TP rules, everything else
    replicated. Optimizer moments inherit the param shardings through GSPMD
    propagation on the first jitted update."""
    param_sh = param_shardings(state.params, mesh)
    repl = NamedSharding(mesh, P())
    return state.replace(
        step=jax.device_put(state.step, repl),
        params=jax.tree_util.tree_map(jax.device_put, state.params, param_sh),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state.opt_state),
        rng=jax.device_put(state.rng, repl),
    )


# ----------------------------------------------------------------- sharded steps

def make_sharded_xe_step(model: VidCapModel, cfg: Config, mesh: Mesh,
                         base_step: Callable) -> Callable:
    """Wrap a train step with GSPMD shardings: batch over 'data', params per the
    TP rules. ``base_step`` is the unjitted step body (state, batch) → (state, m)."""
    batch_sh = NamedSharding(mesh, batch_spec())

    def run(state: TrainState, batch: Dict[str, jax.Array]):
        batch = {k: jax.lax.with_sharding_constraint(v, batch_sh)
                 for k, v in batch.items()}
        return base_step(state, batch)

    return jax.jit(run, donate_argnums=(0,) if cfg.train.donate_state else ())
