"""top-k variant timing for the beam step: lax.top_k vs approx_max_k vs
two-stage vs iterative extract, on [640, 16000] f32 (dispatch-cancelled)."""
import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import time
import jax
import jax.numpy as jnp
import numpy as np


def main(N=640, V=16_000, K=5):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(N, V)), jnp.float32)

    def scan_of(fn, reps):
        def body(c, _):
            tv, ti = fn(c)
            return c + (tv.sum() + ti.sum().astype(jnp.float32)) * 1e-12, None
        return jax.jit(lambda x0: jax.lax.scan(body, x0, jnp.arange(reps))[0])

    def timeit(name, fn):
        f1, f2 = scan_of(fn, 10), scan_of(fn, 110)
        np.asarray(f1(logits)); np.asarray(f2(logits))
        def run(f):
            t0 = time.time(); np.asarray(f(logits)); return time.time() - t0
        per = (min(run(f2) for _ in range(3)) - min(run(f1) for _ in range(3))) / 100
        print(f"{name:24s} {per*1e6:8.1f} us", flush=True)

    timeit("lax.top_k", lambda x: jax.lax.top_k(x, K))
    timeit("approx_max_k", lambda x: jax.lax.approx_max_k(x, K))
    timeit("approx_max_k r=.99",
           lambda x: jax.lax.approx_max_k(x, K, recall_target=0.99))

    def two_stage(x):
        G = 125                      # groups of 128 lanes
        xg = x.reshape(N, G, 128)
        tv, ti = jax.lax.top_k(xg, K)            # [N, G, K]
        base = (jnp.arange(G) * 128)[None, :, None]
        fv, fi = jax.lax.top_k(tv.reshape(N, G * K), K)
        gidx = (ti + base).reshape(N, G * K)
        sel = jnp.take_along_axis(gidx, fi, axis=-1)
        return fv, sel

    timeit("two-stage top_k", two_stage)

    def iterative(x):
        cur = x
        vals, idxs = [], []
        col = jnp.arange(V)[None, :]
        for _ in range(K):
            m = cur.max(-1)
            a = cur.argmax(-1)
            vals.append(m); idxs.append(a)
            cur = jnp.where(col == a[:, None], -1e30, cur)
        return jnp.stack(vals, -1), jnp.stack(idxs, -1)

    timeit("iterative extract", iterative)

    # correctness spot check
    rv, ri = jax.lax.top_k(logits, K)
    for name, fn in (("two_stage", two_stage), ("iter", iterative)):
        v, i = fn(logits)
        np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-6)
        print(f"{name} matches lax.top_k values", flush=True)


if __name__ == "__main__":
    main()
