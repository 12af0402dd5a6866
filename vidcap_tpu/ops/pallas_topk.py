"""Fused vocab-projection + per-row top-K Pallas kernel for beam search.

The XLA beam step materializes [B·K, V] f32 logits (41MB at B=128, V=16k), reads
them again for log_softmax and again for top_k — ~3 sweeps of HBM per decode
step on top of the W_out read. This kernel streams W_out from HBM in 128-aligned
tiles and folds each tile into a running per-row top-K and logsumexp; only
[N, K] survives.

Exactness: per-row top-K of logits == top-K of log-softmax (monotone per row),
and the union of per-row top-Ks contains the global top-K over (row, vocab)
pairs, so beam results are identical to the full-logits path (up to ties).
Parity test: tests/test_pallas_topk.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
NEG = -1e30


def _pick_tile(vp: int, cap: int = 2048) -> int:
    best = 128
    for k in range(1, cap // 128 + 1):
        t = 128 * k
        if vp % t == 0:
            best = t
    return best


def _merge_topk(vals, idxs, K: int):
    """vals/idxs [N, M] → per-row top-K by iterative max-extract (Mosaic-safe:
    no sort/gather primitives)."""
    N, M = vals.shape
    out_v, out_i = [], []
    cur = vals
    for _ in range(K):
        m = jnp.max(cur, axis=-1, keepdims=True)              # [N, 1]
        am = jnp.argmax(cur, axis=-1)[:, None]                # [N, 1]
        col = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1)
        sel = col == am
        out_v.append(m)
        out_i.append(jnp.max(jnp.where(sel, idxs, 0), axis=-1, keepdims=True))
        cur = jnp.where(sel, NEG, cur)
    return jnp.concatenate(out_v, -1), jnp.concatenate(out_i, -1)


def _kernel(h_ref, bout_ref, wout_hbm, vals_out, idx_out, lse_out,
            best_v_s, best_i_s, m_s, s_s, wout_buf, sems,
            *, N: int, H: int, Vp: int, TILE: int, K: int, vocab_size: int):
    n_tiles = Vp // TILE

    best_v_s[:] = jnp.full_like(best_v_s[:], NEG)
    best_i_s[:] = jnp.zeros_like(best_i_s[:])
    m_s[:] = jnp.full_like(m_s[:], NEG)
    s_s[:] = jnp.zeros_like(s_s[:])

    def dma(j, slot):
        return pltpu.make_async_copy(
            wout_hbm.at[:, pl.ds(j * TILE, TILE)], wout_buf.at[slot],
            sems.at[slot])

    dma(0, 0).start()

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < n_tiles)
        def _():
            dma(j + 1, (j + 1) % 2).start()

        dma(j, slot).wait()
        # mirror flax Dense(dtype=bf16): matmul → bf16 round → bf16 bias → f32
        logits = (jnp.dot(h_ref[:], wout_buf[slot],
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
                  + bout_ref[0, pl.ds(j * TILE, TILE)][None, :]
                  .astype(jnp.bfloat16)).astype(jnp.float32)   # [N, TILE]
        col = jax.lax.broadcasted_iota(jnp.int32, (N, TILE), 1) + j * TILE
        logits = jnp.where(col < vocab_size, logits, NEG)

        # running logsumexp
        t_max = jnp.max(logits, axis=-1, keepdims=True)
        m_old = m_s[:, 0:1]
        m_new = jnp.maximum(m_old, t_max)
        s_s[:, 0:1] = (s_s[:, 0:1] * jnp.exp(m_old - m_new)
                       + jnp.sum(jnp.exp(logits - m_new), axis=-1,
                                 keepdims=True))
        m_s[:, 0:1] = m_new

        # tile top-K, then merge with the running top-K
        tv, ti = _merge_topk(logits, col, K)                  # [N, K]
        merged_v = jnp.concatenate([best_v_s[:, :K], tv], -1)  # [N, 2K]
        merged_i = jnp.concatenate([best_i_s[:, :K], ti], -1)
        nv, ni = _merge_topk(merged_v, merged_i, K)
        best_v_s[:, :K] = nv
        best_i_s[:, :K] = ni
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)

    lse = m_s[:, 0:1] + jnp.log(jnp.maximum(s_s[:, 0:1], 1e-30))
    vals_out[:, :] = jnp.pad(best_v_s[:, :K] - lse, ((0, 0), (0, 128 - K)),
                             constant_values=NEG) if K < 128 else \
        best_v_s[:, :K] - lse
    idx_out[:, :] = jnp.pad(best_i_s[:, :K], ((0, 0), (0, 128 - K))) \
        if K < 128 else best_i_s[:, :K]
    lse_out[:, :] = jnp.broadcast_to(lse, lse_out.shape)


def topk_project(h: Array, w_out: Array, b_out: Array, K: int,
                 vocab_size: int, interpret: bool = False
                 ) -> Tuple[Array, Array]:
    """h f32/bf16[N, H]; w_out bf16[H, Vp] (HBM-streamed); b_out f32[Vp].

    Returns (logp f32[N, K] — log-softmax values of the per-row top-K logits,
    idx i32[N, K])."""
    N, H = h.shape
    Vp = w_out.shape[1]
    TILE = _pick_tile(Vp)
    if jax.default_backend() == "cpu":
        interpret = True

    kern = functools.partial(_kernel, N=N, H=H, Vp=Vp, TILE=TILE, K=K,
                             vocab_size=vocab_size)
    vals, idx, _ = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # h
            pl.BlockSpec(memory_space=pltpu.VMEM),     # b_out
            pl.BlockSpec(memory_space=pltpu.HBM),      # w_out
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 128), jnp.float32),
            jax.ShapeDtypeStruct((N, 128), jnp.int32),
            jax.ShapeDtypeStruct((N, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, 128), jnp.float32),         # best values
            pltpu.VMEM((N, 128), jnp.int32),           # best indices
            pltpu.VMEM((N, 128), jnp.float32),         # running max
            pltpu.VMEM((N, 128), jnp.float32),         # running sum
            pltpu.VMEM((2, H, TILE), jnp.bfloat16),    # w_out double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(h.astype(jnp.bfloat16), b_out.reshape(1, -1).astype(jnp.float32),
      w_out.astype(jnp.bfloat16))
    return vals[:, :K], idx[:, :K]
