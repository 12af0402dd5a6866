"""Multitask auxiliary heads (SURVEY.md C15, BASELINE.json configs[3]).

The reference regularizes end-to-end fine-tuning with attribute / classification
prediction heads sharing the video encoder. Here: a small MLP over the decoder's
masked-mean-pooled encoded features → multi-hot attribute logits, trained with BCE
(objectives/multitask.py).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class AttributeHead(nn.Module):
    num_attributes: int
    hidden_dim: int = 512
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, encoded: Array) -> Array:
        """encoded: f32[B, H] shared video-encoder output → logits f32[B, K]."""
        x = encoded.astype(self.compute_dtype)
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.compute_dtype,
                             param_dtype=jnp.float32, name="fc1")(x))
        logits = nn.Dense(self.num_attributes, dtype=self.compute_dtype,
                          param_dtype=jnp.float32, name="fc2")(x)
        return logits.astype(jnp.float32)
