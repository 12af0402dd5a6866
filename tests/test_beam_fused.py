"""Fused-top-K beam (beam_decode_fused + ops/pallas_topk) vs the reference beam:
same sequences/scores up to bf16 tie noise (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from vidcap_tpu.models.decoding import (beam_decode, beam_decode_fused,
                                        tile_recurrent)
from vidcap_tpu.models.model import VidCapModel, create_model, init_params


def test_fused_beam_matches_reference(tiny_cfg):
    model = create_model(tiny_cfg, vocab_size=100)
    params = init_params(model, tiny_cfg, jax.random.key(8))
    B, K, L = 8, 4, 8
    rng = np.random.default_rng(4)
    feats = jnp.asarray(
        rng.normal(size=(B, tiny_cfg.data.num_frames,
                         tiny_cfg.data.feature_dim)), jnp.float32)
    state = model.apply({"params": params}, feats,
                        method=VidCapModel.init_state)

    def beam_step(st, tok):
        return model.apply({"params": params}, st, tok, K,
                           method=VidCapModel.step_beam)

    def beam_step_h(st, tok):
        return model.apply({"params": params}, st, tok, K,
                           method=VidCapModel.step_beam_hidden)

    t_ref, s_ref = beam_decode(beam_step, tile_recurrent(state, K), batch=B,
                               max_len=L, beam_width=K)

    out_w = params["decoder"]["out_proj"]["kernel"]
    out_b = params["decoder"]["out_proj"]["bias"]
    t_fus, s_fus = beam_decode_fused(beam_step_h, out_w, out_b,
                                     tile_recurrent(state, K), batch=B,
                                     max_len=L, beam_width=K, vocab_size=100)

    # scores must agree to bf16 tolerance; sequences agree except on ties
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_fus),
                               rtol=5e-3, atol=5e-2)
    match = (np.asarray(t_ref) == np.asarray(t_fus)).mean()
    assert match > 0.85, (match, np.asarray(t_ref)[0], np.asarray(t_fus)[0])
