"""Component-level beam-step timing at the B=192 bf16-logits operating point.
Long in-jit scans (500 reps) so dispatch overhead is negligible.
PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_beam_parts2.py [B]"""
import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 500


def main(B=192, K=5, V=16_128, H=512, T=26, A=512):
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
    logits_bf = jnp.asarray(rng.normal(size=(N, V)), jnp.bfloat16)
    alive = jnp.zeros((B, K), jnp.float32)

    def timeit(name, fn, x):
        def body(c, _):
            return fn(c), None

        f = jax.jit(lambda x0: jax.lax.scan(body, x0, jnp.arange(REPS))[0])
        np.asarray(jax.tree_util.tree_leaves(f(x))[0])
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(f(x))[0])
        per = (time.time() - t0) / REPS
        print(f"{name:32s} {per*1e6:8.1f} us/iter", flush=True)

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
        return ctx.reshape(N, H) * 1e-9 + hh

    timeit("attention(beam-shared)", attn, h)

    def lstm(hh):
        xh = jnp.concatenate([hh, hh, hh], -1).astype(jnp.bfloat16)
        g = jnp.dot(xh, wg, preferred_element_type=jnp.float32)
        return hh + g.sum(-1, keepdims=True) * 1e-12

    timeit("lstm gates", lstm, h)

    def proj_bf16(hh):
        lg = jnp.dot(hh.astype(jnp.bfloat16), wout)        # bf16 out
        return hh + lg.astype(jnp.float32).sum(-1, keepdims=True) * 1e-12

    timeit("out_proj [N,V] bf16", proj_bf16, h)

    def lse(lg):
        s = jax.scipy.special.logsumexp(lg.astype(jnp.float32), axis=-1)
        return lg + (s.sum() * 1e-12).astype(lg.dtype)

    timeit("logsumexp f32-acc", lse, logits_bf)

    def topk_iter(lg):
        cur = lg
        col = jnp.arange(V)[None, :]
        tot = jnp.zeros((), jnp.float32)
        for _ in range(K):
            m = cur.max(-1)
            a = cur.argmax(-1)
            tot += m.astype(jnp.float32).sum() + a.sum().astype(jnp.float32)
            cur = jnp.where(col == a[:, None], jnp.asarray(-jnp.inf, lg.dtype),
                            cur)
        return lg + (tot * 1e-12).astype(lg.dtype)

    timeit("topk iterative bf16", topk_iter, logits_bf)

    def book(carry):
        hc_, seq_, alive_ = carry
        cand = alive_[:, :, None] + hc_[0, :K, :K][None]
        tl, tix = jax.lax.top_k(cand.reshape(B, K * K), K)
        src = tix // K
        bidx = jnp.arange(B)[:, None]
        ns = seq_[bidx, src] + 1
        flat = (bidx * K + src).reshape(N)
        return (hc_[:, flat], ns, tl)

    seq = jnp.zeros((B, K, 30), jnp.int32)
    hc = jnp.asarray(rng.normal(size=(2, N, H)), jnp.float32)
    timeit("bookkeeping+hc gather", book, (hc, seq, alive))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 192)
