"""int8 vocab projection for the beam decode (SURVEY.md §6 perf work,
`decode.int8_vocab_projection`).

The beam step's [B·K, H] × [H, Vp] vocab projection is ~17% of step time
(ARCHITECTURE.md "where the beam step's time goes"). On the v5e MXU an
int8×int8 matmul with i32 accumulation runs at 2× bf16 throughput and halves
the W_out read traffic — measured **+10.8% end-to-end beam-5 captions/s**
in the in-jit A/B (`scripts/bench_beam_int8.py`, B=184).

It is NOT bit-identical to the bf16 path: symmetric per-output-channel weight
rounding moves logits by ~1e-2. On RANDOM weights that flips 66% of beam
captions (near-zero top-k margins); on a TRAINED production checkpoint the
flip rate drops to 15.8% and held-out quality is PRESERVED — val CIDEr
1.7448 → 1.7477 (+0.003), BLEU-4 −0.0015, METEOR −0.0014 on the 500-video
at-scale val split (`scripts/eval_int8_quality.py`,
`artifacts/r5_int8_quality.json`). Hence: shipped as an opt-in flag, default
OFF so decodes stay bit-reproducible against the exact-beam oracle tests.

Both functions are pure jnp and run INSIDE the jitted decode: quantization
depends only on params, so XLA hoists it out of the `lax.scan` loop — the
per-dispatch cost is one pass over W_out (~16 MB), amortized over the whole
decode.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _find_out_proj(params) -> Tuple[Array, Array]:
    """Locate the decoder's out_proj Dense kernel/bias anywhere in the tree
    (the decoder may be nested under different module scopes per preset)."""
    kernel = bias = None

    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from walk(v, path + (k,))
        else:
            yield path, tree

    for path, leaf in walk(params):
        if "out_proj" in path:
            if path[-1] == "kernel":
                kernel = leaf
            elif path[-1] == "bias":
                bias = leaf
    if kernel is None:
        raise ValueError("int8_vocab_projection: no 'out_proj' kernel in the "
                         "param tree — is this a decoder param dict?")
    return kernel, bias


def quantize_out_proj(params, vocab_size: int
                      ) -> Tuple[Array, Array, Array]:
    """Symmetric per-output-channel int8 quantization of out_proj:
    ``W8[h, v] * wscale[v] ≈ W[h, v]``. The padded-vocab -1e30 mask folds
    into the returned bias (same trick as the ``skip_vocab_mask`` path,
    models/decoder.py), so callers feed the logits straight to top-k."""
    kernel, bias = _find_out_proj(params)
    W = kernel.astype(jnp.float32)                            # [H, Vp]
    wscale = jnp.maximum(jnp.abs(W).max(axis=0), 1e-8) / 127.0  # [Vp]
    W8 = jnp.clip(jnp.round(W / wscale), -127, 127).astype(jnp.int8)
    Vp = W.shape[1]
    b = (jnp.zeros((Vp,), jnp.float32) if bias is None
         else bias.astype(jnp.float32))
    b = jnp.where(jnp.arange(Vp) < vocab_size, b, -1e30)
    return W8, wscale[None, :], b


def int8_logits(h: Array, W8: Array, wscale: Array, bq: Array) -> Array:
    """``h f32/bf16[N, H] → bf16[N, Vp]`` logits via one int8×int8 MXU matmul
    (i32 accumulation) with per-row dynamic activation quantization."""
    h = h.astype(jnp.float32)
    hscale = jnp.max(jnp.abs(h), -1, keepdims=True) / 127.0   # [N, 1]
    h8 = jnp.clip(jnp.round(h / jnp.maximum(hscale, 1e-8)),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(h8, W8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (hscale * wscale)
            + bq).astype(jnp.bfloat16)
