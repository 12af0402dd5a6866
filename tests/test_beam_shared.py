"""Shared-keys beam step (decoder.step_beam) must decode identically to the
fully-tiled beam (same math, K× less attention HBM traffic)."""
import jax
import jax.numpy as jnp
import numpy as np

from vidcap_tpu.models.decoding import (beam_decode, tile_recurrent,
                                        tile_state)
from vidcap_tpu.models.model import VidCapModel, create_model, init_params


def test_shared_keys_beam_matches_tiled(tiny_cfg):
    model = create_model(tiny_cfg, vocab_size=100)
    params = init_params(model, tiny_cfg, jax.random.key(5))
    B, K, L = 4, 3, 8
    rng = np.random.default_rng(2)
    feats = jnp.asarray(
        rng.normal(size=(B, tiny_cfg.data.num_frames,
                         tiny_cfg.data.feature_dim)), jnp.float32)
    state = model.apply({"params": params}, feats,
                        method=VidCapModel.init_state)

    def step(st, tok):
        return model.apply({"params": params}, st, tok,
                           method=VidCapModel.step)

    def beam_step(st, tok):
        return model.apply({"params": params}, st, tok, K,
                           method=VidCapModel.step_beam)

    t_old, s_old = beam_decode(step, tile_state(state, K, B), batch=B,
                               max_len=L, beam_width=K)
    t_new, s_new = beam_decode(beam_step, tile_recurrent(state, K), batch=B,
                               max_len=L, beam_width=K)
    np.testing.assert_array_equal(np.asarray(t_old), np.asarray(t_new))
    np.testing.assert_allclose(np.asarray(s_old), np.asarray(s_new),
                               rtol=1e-5, atol=1e-5)


def test_bf16_logits_beam_bit_identical(tiny_cfg):
    """keep_compute_dtype=True (bf16-stored logits) must produce the SAME
    beams: the Dense output is bf16-rounded either way, so skipping the f32
    upcast changes the storage dtype of the [N, V] buffer, not its values."""
    assert tiny_cfg.model.compute_dtype == "bfloat16"
    model = create_model(tiny_cfg, vocab_size=100)
    params = init_params(model, tiny_cfg, jax.random.key(7))
    B, K, L = 4, 5, 10
    rng = np.random.default_rng(3)
    feats = jnp.asarray(
        rng.normal(size=(B, tiny_cfg.data.num_frames,
                         tiny_cfg.data.feature_dim)), jnp.float32)
    state = model.apply({"params": params}, feats,
                        method=VidCapModel.init_state)

    def mk_step(bf16):
        def beam_step(st, tok):
            return model.apply({"params": params}, st, tok, K, bf16,
                               method=VidCapModel.step_beam)
        return beam_step

    t_f32, s_f32 = beam_decode(mk_step(False), tile_recurrent(state, K),
                               batch=B, max_len=L, beam_width=K)
    t_bf, s_bf = beam_decode(mk_step(True), tile_recurrent(state, K),
                             batch=B, max_len=L, beam_width=K)
    np.testing.assert_array_equal(np.asarray(t_f32), np.asarray(t_bf))
    np.testing.assert_array_equal(np.asarray(s_f32), np.asarray(s_bf))
