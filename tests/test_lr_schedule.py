"""LR schedules (SURVEY.md C17 "Adam + grad clip, LR schedule"):
warmup/cosine/exponential knobs on top of the staged optimizer."""
import dataclasses

import jax
import numpy as np
import pytest

from vidcap_tpu.train.state import create_train_state, make_lr_schedule


def _t(tiny_cfg, **kw):
    return dataclasses.replace(tiny_cfg.train, **kw)


def test_constant_is_plain_float(tiny_cfg):
    s = make_lr_schedule(_t(tiny_cfg, learning_rate=1e-3))
    assert s == pytest.approx(1e-3)


def test_cosine_endpoints(tiny_cfg):
    s = make_lr_schedule(_t(tiny_cfg, learning_rate=1e-3, lr_schedule="cosine",
                            lr_decay_steps=100, lr_decay_rate=0.1))
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-5)
    assert float(s(50)) == pytest.approx((1e-3 + 1e-4) / 2, rel=1e-5)


def test_exponential_decay(tiny_cfg):
    s = make_lr_schedule(_t(tiny_cfg, learning_rate=1e-3,
                            lr_schedule="exponential",
                            lr_decay_steps=200, lr_decay_rate=0.5))
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(200)) == pytest.approx(5e-4, rel=1e-5)
    assert float(s(400)) == pytest.approx(2.5e-4, rel=1e-5)


def test_warmup_then_decay_clock_rebases(tiny_cfg):
    s = make_lr_schedule(_t(tiny_cfg, learning_rate=1e-3, warmup_steps=10,
                            lr_schedule="cosine", lr_decay_steps=100,
                            lr_decay_rate=0.0))
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1e-3)
    # decay horizon counts from the END of warmup
    assert float(s(110)) == pytest.approx(0.0, abs=1e-9)


def test_decay_steps_defaults_to_num_steps(tiny_cfg):
    s = make_lr_schedule(_t(tiny_cfg, learning_rate=1e-3, lr_schedule="cosine",
                            lr_decay_steps=0, num_steps=40, lr_decay_rate=0.0))
    assert float(s(40)) == pytest.approx(0.0, abs=1e-9)


def test_unknown_schedule_raises(tiny_cfg):
    with pytest.raises(ValueError, match="lr_schedule"):
        make_lr_schedule(_t(tiny_cfg, lr_schedule="linear"))


def test_train_step_under_cosine(tiny_cfg, tiny_dataset):
    """The scheduled optimizer integrates with the jitted step: params move,
    and a warmup step-0 update is exactly zero (lr 0)."""
    import jax.numpy as jnp

    from vidcap_tpu.models.model import create_model, init_params
    from vidcap_tpu.train.steps import make_xe_step

    cfg = dataclasses.replace(
        tiny_cfg, train=_t(tiny_cfg, lr_schedule="cosine", warmup_steps=2,
                           donate_state=False))
    model = create_model(cfg, tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    state = create_train_state(cfg, params)
    b = next(tiny_dataset.batches(cfg.train.batch_size, seed=0))
    batch = {k: jnp.asarray(v) for k, v in b.__dict__.items()}
    step = make_xe_step(model, cfg)
    s1, m1 = step(state, batch)
    # warmup schedule value at count=0 is 0.0 ⇒ adam update is exactly 0
    for a, b2 in zip(jax.tree.leaves(params), jax.tree.leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    s2, m2 = step(s1, batch)
    # count=1 ⇒ lr > 0 ⇒ params move
    moved = any(float(abs(np.asarray(a) - np.asarray(b2)).max()) > 0
                for a, b2 in zip(jax.tree.leaves(s1.params),
                                 jax.tree.leaves(s2.params)))
    assert moved
