"""SCST / REINFORCE policy-gradient loss (SURVEY.md C13, §3.2).

loss = -E[(r(sample) - r(greedy)) · Σ_t log π(w_t)] with the greedy rollout as the
self-critical baseline. Rewards come from integer token arrays (no gradient path),
so the advantage is a constant w.r.t. params; the gradient flows only through the
sampled tokens' log-probs recorded during the rollout scan.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vidcap_tpu.models.decoding import Rollout

Array = jax.Array


def scst_loss(sample: Rollout, reward_sample: Array, reward_greedy: Array
              ) -> Tuple[Array, dict]:
    """sample: the multinomial rollout (logp carries gradients);
    rewards: f32[B] (no gradient path). Returns (loss, metrics)."""
    advantage = jax.lax.stop_gradient(reward_sample - reward_greedy)  # [B]
    seq_logp = (sample.logp * sample.mask).sum(-1)                    # [B]
    ntok = jnp.maximum(sample.mask.sum(), 1.0)
    loss = -(advantage * seq_logp).sum() / ntok
    metrics = {
        "pg_loss": loss,
        "reward_sample": reward_sample.mean(),
        "reward_greedy": reward_greedy.mean(),
        "advantage_mean": advantage.mean(),
        "advantage_std": advantage.std(),
    }
    return loss, metrics
