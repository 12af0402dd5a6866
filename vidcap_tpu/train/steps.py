"""Jitted train steps (SURVEY.md C17, §3.1–3.2).

Each stage is ONE compiled function: forward + loss + grads + optimizer update,
with the train state donated (no reallocation per step). The SCST step additionally
contains both rollouts and the on-device reward — zero host round-trips
(BASELINE.json north_star; contrast SURVEY.md §3.2's two per-step host crossings).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidcap_tpu.config import Config
from vidcap_tpu.models.model import VidCapModel
from vidcap_tpu.objectives.multitask import attribute_bce_loss
from vidcap_tpu.objectives.xe import masked_xe_loss, shift_right
from vidcap_tpu.train.state import TrainState

Array = jax.Array


def make_xe_step_body(model: VidCapModel, cfg: Config
                      ) -> Callable[[TrainState, Dict[str, Array]],
                                    Tuple[TrainState, Dict[str, Array]]]:
    """UNJITTED cross-entropy (stage 1) / end-to-end (stage 3) step body; the
    multitask attribute BCE joins the total loss when attribute_loss_weight > 0.

    One body serves both the single-device step (``make_xe_step`` jits it) and
    the GSPMD-sharded step (``parallel.sharding.make_sharded_xe_step`` wraps it
    with batch sharding constraints) — so DP == single-device parity compares
    the exact same computation (SURVEY.md §2.3)."""
    attr_w = cfg.train.attribute_loss_weight
    dropout = cfg.model.dropout_rate > 0
    if dropout:
        from vidcap_tpu.models.model import create_model
        train_model = create_model(cfg, model.vocab_size, deterministic=False)
    else:
        train_model = model

    accum = max(1, cfg.train.grad_accum)

    def pieces_fn(params, batch, rng):
        """Loss pieces: (xe token-mean, token count, attr BCE row-mean)."""
        rngs = {"dropout": rng} if dropout else None
        # ONE backbone encode per step (e2e mode, VERDICT r3 weak #1): pixels
        # → [B,T,D] features consumed by BOTH the XE path and the attribute
        # head; gradients flow through the shared encode into the CNN exactly
        # once. Feature-mode inputs pass through unchanged (encode_features is
        # the identity on [B,T,D]).
        feats = model.apply({"params": params}, batch["features"],
                            method=VidCapModel.encode_features)
        logits = train_model.apply({"params": params}, feats, None,
                                   shift_right(batch["tokens"]),
                                   method=VidCapModel.xe_logits, rngs=rngs)
        xe, ntok = masked_xe_loss(logits, batch["tokens"], batch["mask"])
        if attr_w > 0:
            attr_logits = model.apply({"params": params}, feats,
                                      method=VidCapModel.attribute_logits)
            bce = attribute_bce_loss(attr_logits, batch["attributes"])
        else:
            bce = jnp.float32(0.0)
        return xe, ntok, bce

    def loss_fn(params, batch, rng):
        xe, ntok, bce = pieces_fn(params, batch, rng)
        metrics = {"xe_loss": xe, "tokens": ntok}
        total = xe
        if attr_w > 0:
            total = total + attr_w * bce
            metrics["attr_loss"] = bce
        metrics["loss"] = total
        return total, metrics

    def accum_grads(state: TrainState, batch: Dict[str, Array], sub: Array):
        """Microbatched grads (cfg.train.grad_accum > 1): lax.scan per-
        microbatch grads into one sum, weighted so the result EQUALS the
        full-batch gradient — the XE term by micro-token-count over the full
        batch's token total, the attr row-mean by 1/K — while peak activation
        memory is one microbatch's (the scan frees each iteration's
        activations). This is the single-chip large-effective-batch path for
        the memory-bound e2e/composed stages.

        Equality caveat: with dropout enabled each microbatch draws its own
        rng split, so the accumulated gradient is a different (unbiased)
        estimator than one full-batch dropout draw; exact equality holds for
        deterministic losses (dropout_rate = 0, the e2e presets' default)."""
        B = batch["tokens"].shape[0]
        if B % accum:
            raise ValueError(
                f"batch size {B} is not divisible by grad_accum {accum}")
        n_total = jnp.maximum(jnp.sum(batch["mask"]), 1.0)

        def contrib(params, mb, r):
            xe, ntok, bce = pieces_fn(params, mb, r)
            c = xe * ntok / n_total
            if attr_w > 0:
                c = c + attr_w * bce / accum
            return c, (xe * ntok, ntok, bce)

        micro = jax.tree.map(
            lambda x: x.reshape(accum, B // accum, *x.shape[1:]), batch)
        subs = jax.random.split(sub, accum)
        zero = jnp.float32(0.0)

        def scan_one(carry, xs):
            g_acc, xe_num, tok, bce_acc = carry
            mb, r = xs
            (_, (xn, nt, bc)), g = jax.value_and_grad(
                contrib, has_aux=True)(state.params, mb, r)
            return (jax.tree.map(jnp.add, g_acc, g),
                    xe_num + xn, tok + nt, bce_acc + bc), None

        zeros_g = jax.tree.map(jnp.zeros_like, state.params)
        (grads, xe_num, ntok, bce_sum), _ = jax.lax.scan(
            scan_one, (zeros_g, zero, zero, zero), (micro, subs))
        xe_mean = xe_num / n_total          # == full-batch masked XE
        metrics = {"xe_loss": xe_mean, "tokens": ntok}
        total = xe_mean
        if attr_w > 0:
            bce_mean = bce_sum / accum      # == full-batch row-mean (equal micros)
            total = total + attr_w * bce_mean
            metrics["attr_loss"] = bce_mean
        metrics["loss"] = total
        return grads, metrics

    def body(state: TrainState, batch: Dict[str, Array]):
        rng, sub = jax.random.split(state.rng)
        if accum == 1:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, sub)
        else:
            grads, metrics = accum_grads(state, batch, sub)
        metrics["grad_norm"] = optax_global_norm(grads)
        return state.apply_gradients(grads).replace(rng=rng), metrics

    return body


def make_xe_step(model: VidCapModel, cfg: Config
                 ) -> Callable[[TrainState, Dict[str, Array]],
                               Tuple[TrainState, Dict[str, Array]]]:
    """Jitted single-device XE/e2e train step."""
    return jax.jit(make_xe_step_body(model, cfg),
                   donate_argnums=(0,) if cfg.train.donate_state else ())


def _build_banks(dataset, banks=None, sharding=None) -> Dict[str, Array]:
    """Validate feature-mode inputs and place the whole feature/attribute
    tensors in HBM once (shared by the K=1, K>1, and sharded banked
    builders — the banks must exist on-device exactly once). ``sharding``
    places them on a mesh (replicated, for the sharded path)."""
    feats = dataset.features
    if feats.ndim != 3:
        raise ValueError(
            "device_feature_bank requires feature-mode inputs [N, T, D]; "
            f"got ndim={feats.ndim} (pixel/e2e datasets are too large to "
            "bank)")
    put = (jax.device_put if sharding is None
           else lambda x: jax.device_put(x, sharding))
    if banks is None:
        # device_put the HOST arrays directly — staging through jnp.asarray
        # first would copy the full bank to the default device and then
        # re-place it (an extra ~800 MB transfer + transient chip-0 copy at
        # production dims)
        banks = {
            "features": put(np.asarray(feats)),
            "attributes": put(np.asarray(dataset.attributes)),
        }
    elif sharding is not None:
        # pre-built (e.g. single-device) banks handed to the sharded
        # builder must still end up replicated, or every step implicitly
        # re-shards the full bank
        banks = {k: put(v) for k, v in banks.items()}
    return banks


def _banked_apply(body: Callable) -> Callable:
    """Wrap an unjitted step body so features/attributes come from on-device
    bank gathers by ``video_idx`` — the ONE place the bank-gather semantics
    live, so the K=1 tail path and the K>1 scan body cannot diverge."""
    def banked(state: TrainState, batch: Dict[str, Array],
               bank_feats: Array, bank_attrs: Array):
        b = dict(batch)
        vidx = batch["video_idx"]
        b["features"] = jnp.take(bank_feats, vidx, axis=0)
        b["attributes"] = jnp.take(bank_attrs, vidx, axis=0)
        return body(state, b)
    return banked


def make_banked_step(cfg: Config, body: Callable, dataset, banks=None
                     ) -> Tuple[Callable, Dict[str, Array]]:
    """Wrap an UNJITTED step body so features/attributes are gathered from a
    device-resident bank instead of shipped with every batch
    (``cfg.train.device_feature_bank``).

    The whole ``dataset.features`` tensor ([N_videos, T, D], e.g. 5k × 26 ×
    1536 f32 ≈ 800 MB) is placed in HBM once; the jitted step gathers its
    batch rows by ``video_idx`` on-device. Per-step host→device payload drops
    to the token rows. Numerically bit-exact vs the host-transfer path: the
    gather reads the SAME f32 rows the loader would have sliced on the host.

    Returns ``(step_fn, banks)`` where ``step_fn(state, batch)`` closes over
    the device banks (they stay resident — no re-transfer per call)."""
    banks = _build_banks(dataset, banks)
    banked = _banked_apply(body)
    jitted = jax.jit(banked,
                     donate_argnums=(0,) if cfg.train.donate_state else ())

    def step_fn(state: TrainState, batch: Dict[str, Array]):
        return jitted(state, batch, banks["features"], banks["attributes"])

    return step_fn, banks


def make_banked_multistep(cfg: Config, body: Callable, dataset, k: int,
                          banks=None) -> Tuple[Callable, Dict[str, Array]]:
    """K train steps per dispatch: ``lax.scan`` the banked step body over K
    stacked token batches inside ONE jitted call (``cfg.train.
    steps_per_dispatch``).

    With the feature bank the per-step payload is tiny, so wall-clock is
    dominated by per-dispatch host↔device round-trips (~12 ms on this
    environment's tunnel vs ms-scale chip step). Scanning K steps amortizes
    that latency K×. Numerics are UNCHANGED: the scan body is the same
    ``body`` the K=1 path jits, applied to the same batch stream in the same
    order — params after a chunk equal K single steps bit-for-bit
    (tests/test_multistep.py).

    ``step_fn(state, batches)`` takes ``batches`` stacked along a leading
    K axis; returns ``(state, metrics)`` with each metric leaf shaped [K]
    (per-step values, so logging granularity is preserved)."""
    banks = _build_banks(dataset, banks)
    banked = _banked_apply(body)

    def chunk(state: TrainState, batches: Dict[str, Array],
              bank_feats: Array, bank_attrs: Array):
        def one(s, b):
            return banked(s, b, bank_feats, bank_attrs)
        return jax.lax.scan(one, state, batches)

    jitted = jax.jit(chunk,
                     donate_argnums=(0,) if cfg.train.donate_state else ())

    def step_fn(state: TrainState, batches: Dict[str, Array]):
        return jitted(state, batches, banks["features"], banks["attributes"])

    return step_fn, banks


def optax_global_norm(tree) -> Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
