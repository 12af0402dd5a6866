"""Gradient accumulation (cfg.train.grad_accum, SURVEY.md C17): microbatched
grads summed with exact weighting must equal the full-batch gradient, so the
memory-bound e2e/composed stages can train at large EFFECTIVE batch on one
chip. Gradients are read directly via an SGD(1.0) train state (param delta ==
-grad) — comparing post-Adam params would test Adam's sign function, not the
accumulation."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vidcap_tpu.models.model import create_model, init_params
from vidcap_tpu.train.scst import make_scst_step
from vidcap_tpu.train.state import TrainState, create_train_state
from vidcap_tpu.train.steps import make_xe_step


def _cfg(tiny_cfg, **train_kw):
    train_kw.setdefault("batch_size", 8)
    train_kw.setdefault("donate_state", False)
    train_kw.setdefault("attribute_loss_weight", 0.2)
    cfg = dataclasses.replace(
        tiny_cfg,
        # f32 compute so accumulation-order noise stays at f32 reassociation
        # level (bf16 forward would bound the comparison at ~1e-2)
        model=dataclasses.replace(tiny_cfg.model, compute_dtype="float32"),
        train=dataclasses.replace(tiny_cfg.train, **train_kw))
    return cfg


def _sgd_state(params, seed=0):
    tx = optax.sgd(1.0)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params),
                      rng=jax.random.key(seed), tx=tx)


def _batch(tiny_dataset, n=8):
    b = next(tiny_dataset.batches(n, seed=3))
    return {k: jnp.asarray(v) for k, v in b.__dict__.items()}


def _grads(step, params, batch):
    st2, metrics = step(_sgd_state(params), batch)
    g = jax.tree.map(lambda a, b: a - b, params, st2.params)
    return g, {k: float(v) for k, v in metrics.items()}


def test_xe_accum_grads_match_full_batch(tiny_cfg, tiny_dataset):
    cfg1 = _cfg(tiny_cfg)
    cfg4 = _cfg(tiny_cfg, grad_accum=4)
    model = create_model(cfg1, tiny_dataset.vocab.size)
    params = init_params(model, cfg1, jax.random.key(0))
    batch = _batch(tiny_dataset)
    # caption lengths must differ across rows or the token weighting is
    # untested (equal-length masks make plain averaging accidentally exact)
    per_row = np.asarray(batch["mask"]).sum(axis=1)
    assert len(set(per_row.tolist())) > 1, "fixture masks are equal length"

    g1, m1 = _grads(make_xe_step(model, cfg1), params, batch)
    g4, m4 = _grads(make_xe_step(model, cfg4), params, batch)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for k in ("loss", "xe_loss", "attr_loss", "tokens"):
        np.testing.assert_allclose(m1[k], m4[k], rtol=1e-5)


def test_xe_accum_indivisible_batch_raises(tiny_cfg, tiny_dataset):
    cfg = _cfg(tiny_cfg, grad_accum=3)
    model = create_model(cfg, tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    with pytest.raises(ValueError, match="not divisible"):
        make_xe_step(model, cfg)(_sgd_state(params), _batch(tiny_dataset))


def test_scst_accum_exact_terms_and_estimator(tiny_cfg, tiny_dataset):
    """PG rollouts differ by rng split (documented estimator), but the
    deterministic terms — XE anchor and attribute BCE — must accumulate to
    the full-batch values exactly."""
    cfg1 = _cfg(tiny_cfg, stage="scst", scst_xe_mix=0.1,
                scst_learning_rate=1e-4)
    cfg2 = dataclasses.replace(
        cfg1, train=dataclasses.replace(cfg1.train, grad_accum=2))
    model = create_model(cfg1, tiny_dataset.vocab.size)
    params = init_params(model, cfg1, jax.random.key(0))
    batch = _batch(tiny_dataset)

    _, m1 = _grads(make_scst_step(model, cfg1, dataset=tiny_dataset),
                   params, batch)
    g2, m2 = _grads(make_scst_step(model, cfg2, dataset=tiny_dataset),
                    params, batch)
    np.testing.assert_allclose(m1["xe_anchor"], m2["xe_anchor"], rtol=1e-5)
    np.testing.assert_allclose(m1["attr_loss"], m2["attr_loss"], rtol=1e-5)
    for k, v in m2.items():
        assert np.isfinite(v), (k, v)
    assert any(float(jnp.abs(x).max()) > 0 for x in jax.tree.leaves(g2))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_accum_matches_single_device(tiny_cfg, tiny_dataset):
    """grad_accum composes with GSPMD DP: the sharded accumulated step must
    compute the same loss/update as the single-device accumulated step."""
    from vidcap_tpu.parallel.mesh import make_mesh
    from vidcap_tpu.parallel.sharding import (make_sharded_step, place_state,
                                              shard_batch)
    from vidcap_tpu.train.steps import make_xe_step_body

    cfg = _cfg(tiny_cfg, grad_accum=2, batch_size=16)
    model = create_model(cfg, tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    batch = _batch(tiny_dataset, n=16)

    single, m1 = _grads(make_xe_step(model, cfg), params, batch)

    mesh = make_mesh(cfg.mesh, num_data=8, num_model=1)
    body = make_xe_step_body(model, cfg)
    with mesh:
        step = make_sharded_step(cfg, mesh, body)
        st = place_state(_sgd_state(params), mesh)
        st2, m2 = step(st, shard_batch(batch, mesh))
    g2 = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                      params, st2.params)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(single), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-4, atol=1e-6)
