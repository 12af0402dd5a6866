"""Multitask attribute BCE loss (SURVEY.md C15, BASELINE.json configs[3]).

Sigmoid binary cross-entropy between the attribute head's logits and the mined
multi-hot targets, weighted into the total loss by ``train.attribute_loss_weight``.
"""
from __future__ import annotations

import jax
import optax

Array = jax.Array


def attribute_bce_loss(logits: Array, targets: Array) -> Array:
    """logits f32[B, K], targets f32[B, K] in {0,1} → scalar mean BCE."""
    return optax.sigmoid_binary_cross_entropy(logits, targets).mean()
