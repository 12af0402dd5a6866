"""Masked sequence cross-entropy (SURVEY.md C12).

Teacher-forced XE over BOS-shifted inputs; loss is summed over real tokens (incl.
<eos>) and normalized by the number of real tokens in the batch — the standard
formulation in the reference lineage (SURVEY.md §3.1).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vidcap_tpu.data.vocab import BOS

Array = jax.Array


def shift_right(tokens: Array, bos: int = BOS) -> Array:
    """[w0, w1, ...] → [<bos>, w0, w1, ...] (drop last) — teacher-forcing inputs."""
    return jnp.concatenate(
        [jnp.full_like(tokens[:, :1], bos), tokens[:, :-1]], axis=1)


def masked_xe_loss(logits: Array, targets: Array, mask: Array
                   ) -> Tuple[Array, Array]:
    """logits f32[B, L, V], targets i32[B, L], mask f32[B, L] → (loss, token_count)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = -(tok_logp * mask).sum() / denom
    return loss, denom


def sequence_logprob(logits: Array, tokens: Array, mask: Array) -> Array:
    """Per-sequence sum of token log-probs under `logits`: f32[B]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
    return (tok_logp * mask).sum(axis=-1)
