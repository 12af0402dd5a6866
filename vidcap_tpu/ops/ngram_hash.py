"""64-bit n-gram hashing, bit-identical on host (numpy/python) and device (jnp).

The on-device CIDEr/BLEU reward (SURVEY.md §3.2, BASELINE.json "CIDEr/BLEU reward
... as batched device ops") matches candidate n-grams against precomputed reference
tables by hashed key. Keys are two independent 32-bit lanes (uint32 ops only — JAX
x64 stays off), giving an effective 64-bit key: for a ~1e6-gram corpus the collision
probability is ~1e-8 (SURVEY.md §7 hard-part #1 mitigation).

The hash is an FNV/xorshift-style rolling mix over the token ids, seeded per n-gram
order so different orders can never collide with each other and one combined table
per reference serves all orders.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_M1 = 0x01000193        # FNV-1a prime, lane 1
_M2 = 0x85EBCA6B        # murmur3 c1, lane 2
_ADD = 0x9E3779B9       # golden-ratio constant
_SEED1 = [0x811C9DC5, 0x1000193F, 0x2F0E1B85, 0x5BD1E995]   # per-order seeds, lane 1
_SEED2 = [0xC2B2AE35, 0x27D4EB2F, 0x165667B1, 0x9E3779B1]   # per-order seeds, lane 2
_MASK = 0xFFFFFFFF


def _mix_host(h: int, t: int, m: int) -> int:
    h = (h ^ ((t + _ADD) & _MASK)) & _MASK
    h = (h * m) & _MASK
    h ^= h >> 15
    return h & _MASK


def host_ngram_key(tokens: Sequence[int], order: int) -> Tuple[int, int]:
    """Hash an n-gram of ``order`` token ids → (lo, hi) uint32 pair.
    ``tokens`` must have exactly ``order`` elements."""
    assert len(tokens) == order and 1 <= order <= 4
    h1, h2 = _SEED1[order - 1], _SEED2[order - 1]
    for t in tokens:
        h1 = _mix_host(h1, int(t), _M1)
        h2 = _mix_host(h2, int(t), _M2)
    return h1, h2


def _mix_device(h: Array, t: Array, m: int) -> Array:
    h = h ^ (t + jnp.uint32(_ADD))
    h = h * jnp.uint32(m)
    h = h ^ (h >> 15)
    return h


def device_ngram_keys(tokens: Array, max_order: int = 4
                      ) -> Tuple[List[Array], List[Array]]:
    """tokens i32[..., L] → per-order key arrays.

    Returns (lo_keys, hi_keys), each a list of length max_order where element
    n-1 has the same shape as ``tokens``; position i holds the hash of
    tokens[..., i:i+n] (positions with i+n > L contain garbage — callers mask
    with the validity mask)."""
    t = tokens.astype(jnp.uint32)
    L = tokens.shape[-1]
    los, his = [], []
    for n in range(1, max_order + 1):
        h1 = jnp.full(t.shape, _SEED1[n - 1], jnp.uint32)
        h2 = jnp.full(t.shape, _SEED2[n - 1], jnp.uint32)
        for k in range(n):
            # token at position i+k, shifted into alignment with position i
            tk = jnp.roll(t, -k, axis=-1) if k else t
            h1 = _mix_device(h1, tk, _M1)
            h2 = _mix_device(h2, tk, _M2)
        los.append(h1)
        his.append(h2)
    return los, his
