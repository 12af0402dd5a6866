"""Fused Pallas beam-core kernel ↔ XLA step_beam parity (interpret mode on CPU;
mirrors tests/test_pallas_decoder.py's strategy for the rollout kernel)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu.models.decoding import beam_decode, tile_recurrent
from vidcap_tpu.models.model import VidCapModel, create_model, init_params
from vidcap_tpu.ops.pallas_beam_core import make_fused_beam_step


@pytest.fixture(scope="module")
def setup():
    from vidcap_tpu.config import get_preset
    cfg = get_preset("synthetic_tiny")
    # a padded-vocab-sized model, bf16 compute like the headline config
    model = create_model(cfg, vocab_size=100)
    params = init_params(model, cfg, jax.random.key(0))
    B, K = 4, 3
    T, D = cfg.data.num_frames, cfg.data.feature_dim
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    state = model.apply({"params": params}, feats,
                        method=VidCapModel.init_state)
    state = tile_recurrent(state, K)
    return cfg, model, params, state, B, K


def test_fused_step_matches_xla(setup):
    cfg, model, params, state, B, K = setup
    tok = jnp.asarray(np.random.default_rng(1).integers(4, 90, B * K),
                      jnp.int32)

    def xla_step(st, t):
        return model.apply({"params": params}, st, t, K, True,
                           method=VidCapModel.step_beam)

    st_x, logits_x = xla_step(state, tok)
    fused = make_fused_beam_step(model, params, K, interpret=True)
    st_f, logits_f = fused(state, tok)

    # recurrent state: identical math module-for-module; interpret mode runs
    # f32 where the chip rounds bf16, so allow small drift
    np.testing.assert_allclose(np.asarray(st_x.h), np.asarray(st_f.h),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(st_x.c), np.asarray(st_f.c),
                               atol=2e-2)
    a = np.asarray(logits_x, np.float32)
    b = np.asarray(logits_f, np.float32)
    np.testing.assert_allclose(a, b, atol=5e-2)
    # the decisions that drive the beam must agree
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.9


def test_fused_beam_decode_tokens_match(setup):
    cfg, model, params, state, B, K = setup

    def xla_step(st, t):
        return model.apply({"params": params}, st, t, K, True,
                           method=VidCapModel.step_beam)

    fused = make_fused_beam_step(model, params, K, interpret=True)
    L = cfg.decode.max_len
    toks_x, sc_x = beam_decode(xla_step, state, batch=B, max_len=L,
                               beam_width=K)
    toks_f, sc_f = beam_decode(fused, state, batch=B, max_len=L,
                               beam_width=K)
    # tiny bf16-vs-f32 drift can flip a near-tie on an untrained model; most
    # rows must match exactly and scores must be close everywhere
    rows = (np.asarray(toks_x) == np.asarray(toks_f)).all(axis=1).sum()
    assert rows >= B - 1, (rows, np.asarray(toks_x), np.asarray(toks_f))
    np.testing.assert_allclose(np.asarray(sc_x), np.asarray(sc_f), atol=0.2)
