"""Component-level beam-step timing (dispatch-cancelled): which part of the
688µs/step at B=128·K=5 dominates? Each component is wrapped in a lax.scan of
`reps` iterations inside one jit, timed at two rep counts to cancel dispatch."""
import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import time

import jax
import jax.numpy as jnp
import numpy as np


def main(B=128, K=5, V=16_000, H=512, T=26, A=512):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    N = B * K

    h = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, T, A)), jnp.bfloat16)
    values = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    fmask = jnp.ones((B, T), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(H, A)) * 0.05, jnp.bfloat16)
    u = jnp.asarray(rng.normal(size=(A,)) * 0.05, jnp.bfloat16)
    wout = jnp.asarray(rng.normal(size=(H, V)) * 0.05, jnp.bfloat16)
    wg = jnp.asarray(rng.normal(size=(H + 2 * H, 4 * H)) * 0.05, jnp.bfloat16)
    logits = jnp.asarray(rng.normal(size=(N, V)), jnp.float32)
    alive = jnp.zeros((B, K), jnp.float32)

    def scan_of(fn, x, reps):
        def body(c, _):
            return fn(c), None
        return jax.jit(lambda x0: jax.lax.scan(body, x0,
                                               jnp.arange(reps))[0])

    def timeit(name, fn, x):
        f1, f2 = scan_of(fn, x, 10), scan_of(fn, x, 110)
        np.asarray(jax.tree_util.tree_leaves(f1(x))[0])
        np.asarray(jax.tree_util.tree_leaves(f2(x))[0])
        def run(f):
            t0 = time.time()
            r = f(x)
            np.asarray(jax.tree_util.tree_leaves(r)[0])
            return time.time() - t0
        t10 = min(run(f1) for _ in range(3))
        t110 = min(run(f2) for _ in range(3))
        per = (t110 - t10) / 100
        print(f"{name:28s} {per*1e6:8.1f} us/iter", flush=True)

    # attention (beam-broadcast, shared keys)
    def attn(hh):
        q = jnp.dot(hh.astype(jnp.bfloat16), wq,
                    preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16).reshape(B, K, A)
        s = jnp.einsum("btka,a->bkt",
                       jnp.tanh(keys[:, :, None, :] + q[:, None, :, :]),
                       u, preferred_element_type=jnp.float32)
        attnw = jax.nn.softmax(jnp.where(fmask[:, None, :] > 0, s, -1e30), -1)
        ctx = jnp.einsum("bkt,btd->bkd", attnw.astype(jnp.bfloat16), values,
                         preferred_element_type=jnp.float32)
        return ctx.reshape(N, H) + hh * 1e-9   # keep carry shape

    timeit("attention(beam-shared)", attn, h)

    # LSTM gates — full-width dependence (sum folds all 4H columns into carry)
    def lstm(hh):
        xh = jnp.concatenate([hh, hh, hh], -1).astype(jnp.bfloat16)
        g = jnp.dot(xh, wg, preferred_element_type=jnp.float32)
        return hh + g.sum(-1, keepdims=True) * 1e-12

    timeit("lstm gates", lstm, h)

    # vocab projection — full [N, V] must be computed (row-sum into carry)
    def proj(hh):
        lg = jnp.dot(hh.astype(jnp.bfloat16), wout,
                     preferred_element_type=jnp.float32)
        return hh + lg.sum(-1, keepdims=True) * 1e-12

    timeit("out_proj [N,V]", proj, h)

    # per-row topk + lse, logits depend on the carry so nothing hoists
    def tk(lg):
        lse = jax.scipy.special.logsumexp(lg, axis=-1)
        tv, ti = jax.lax.top_k(lg, K)
        return lg + (tv.sum() + lse.sum() + ti.sum().astype(jnp.float32)) * 1e-12

    timeit("topk(K)+lse on [N,V] (carry-dep)", tk, logits)

    # K*K bookkeeping + state gather, carry-dependent candidates
    seq = jnp.zeros((B, K, 30), jnp.int32)
    hc = jnp.asarray(rng.normal(size=(2, N, H)), jnp.float32)

    def book(carry):
        hc_, seq_, alive_ = carry
        cand = alive_[:, :, None] + hc_[0, :K, :K][None]   # carry-dependent
        tl, tix = jax.lax.top_k(cand.reshape(B, K * K), K)
        src = tix // K
        bidx = jnp.arange(B)[:, None]
        ns = seq_[bidx, src] + 1
        flat = (bidx * K + src).reshape(N)
        return (hc_[:, flat], ns, tl)

    timeit("bookkeeping+hc gather", book, (hc, seq, alive))


if __name__ == "__main__":
    main()
