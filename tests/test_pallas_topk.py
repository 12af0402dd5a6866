"""Fused project+top-K kernel parity vs the straightforward XLA computation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu.ops.pallas_topk import topk_project


@pytest.mark.parametrize("N,H,Vp,vocab,K", [
    (16, 64, 256, 200, 5),
    (8, 32, 512, 512, 3),
])
def test_topk_project_matches_xla(N, H, Vp, vocab, K):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, Vp)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(Vp,)) * 0.1, jnp.float32)

    vals, idx = topk_project(h, w, b, K=K, vocab_size=vocab, interpret=True)

    # contract: per-row top-K set within bf16 tolerance of the true logp ranking
    # (exact tie ORDER can differ between the kernel's iterative extraction and
    # lax.top_k, and bf16 rounding creates ties; values must match to bf16 ulp)
    logits = (jnp.dot(h.astype(jnp.bfloat16).astype(jnp.float32),
                      w.astype(jnp.bfloat16).astype(jnp.float32))
              + b.astype(jnp.bfloat16).astype(jnp.float32))
    logits = jnp.where(jnp.arange(Vp) < vocab, logits, -1e30)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))

    kv, ki = np.asarray(vals), np.asarray(idx)
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(logp), K)
    ref_v = np.asarray(ref_v)
    for r in range(N):
        # each returned value ≈ the true logp of its index
        np.testing.assert_allclose(kv[r], logp[r, ki[r]], atol=1e-2)
        # sorted values agree with the true top-K values to bf16 tolerance
        np.testing.assert_allclose(np.sort(kv[r])[::-1], ref_v[r], atol=1e-2)
        assert len(set(ki[r].tolist())) == K  # K distinct indices
        # descending order
        assert (np.diff(kv[r]) <= 1e-6).all()


def test_topk_project_dedups_duplicates():
    """Rows with tied logits: indices must be K distinct positions."""
    h = jnp.zeros((8, 32), jnp.float32)
    w = jnp.zeros((32, 256), jnp.float32)
    b = jnp.zeros((256,), jnp.float32)
    vals, idx = topk_project(h, w, b, K=5, vocab_size=256, interpret=True)
    for row in np.asarray(idx):
        assert len(set(row.tolist())) == 5, row
