"""int8 vocab-projection decode flag (decode.int8_vocab_projection,
ops/int8_proj.py).

The path is NOT bit-identical to bf16 by design (see the module docstring —
quality evidence on a trained checkpoint lives in
artifacts/r5_int8_quality.json), so these tests pin the mechanics instead:
quantization error is bounded, padding vocab can never be emitted, the flag
is reachable through the public Captioner surface, and single-step logits
agree with the exact path to quantization tolerance.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu.config import get_preset
from vidcap_tpu.models.model import VidCapModel, create_model, init_params
from vidcap_tpu.ops.int8_proj import (_find_out_proj, int8_logits,
                                      quantize_out_proj)


@pytest.fixture(scope="module")
def setup():
    cfg = get_preset("synthetic_tiny")
    from vidcap_tpu.data.loader import CaptionDataset
    ds = CaptionDataset.synthetic(cfg.data)
    model = create_model(cfg, vocab_size=ds.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    return cfg, ds, model, params


def test_quantization_error_bounded(setup):
    """Reconstructed W8*wscale must sit within half a quantization step of W
    per element (symmetric per-channel contract)."""
    _, ds, model, params = setup
    kernel, _ = _find_out_proj(params)
    W8, wscale, bq = quantize_out_proj(params, ds.vocab.size)
    W = np.asarray(kernel, np.float32)
    err = np.abs(np.asarray(W8, np.float32) * np.asarray(wscale) - W)
    assert err.max() <= np.asarray(wscale).max() * 0.5 + 1e-7
    # padding mask folded into the bias
    assert np.all(np.asarray(bq)[ds.vocab.size:] == -1e30)


def test_single_step_logits_close_and_padding_masked(setup):
    cfg, ds, model, params = setup
    B, K = 4, 3
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, cfg.data.num_frames,
                                         cfg.data.feature_dim)), jnp.float32)
    from vidcap_tpu.models.decoding import tile_recurrent
    state = tile_recurrent(
        model.apply({"params": params}, feats, method=VidCapModel.init_state),
        K)
    tok = jnp.zeros((B * K,), jnp.int32)

    _, exact = model.apply({"params": params}, state, tok, K, False,
                           method=VidCapModel.step_beam)
    W8, wscale, bq = quantize_out_proj(params, ds.vocab.size)
    _, h = model.apply({"params": params}, state, tok, K,
                       method=VidCapModel.step_beam_hidden)
    quant = int8_logits(h, W8, wscale, bq)

    ex = np.asarray(exact, np.float32)[:, :ds.vocab.size]
    q = np.asarray(quant, np.float32)[:, :ds.vocab.size]
    scale = np.abs(ex).max()
    # int8 weight+activation rounding: small relative to the logit range
    assert np.abs(q - ex).max() < 0.05 * scale
    # top-1 rarely flips even on random weights for a single step
    agree = (q.argmax(-1) == ex.argmax(-1)).mean()
    assert agree >= 0.8
    # padding columns are hard-masked
    assert np.all(np.asarray(quant, np.float32)[:, ds.vocab.size:] <= -1e29)


def test_sharded_decode_honors_flag(setup):
    """`serve --sharded` path: make_sharded_decode with the flag on runs on
    the 8-device mesh and emits only real-vocab tokens."""
    cfg, ds, model, params = setup
    cfg8 = cfg.replace(decode=dataclasses.replace(
        cfg.decode, int8_vocab_projection=True))
    from vidcap_tpu.parallel.mesh import make_mesh
    from vidcap_tpu.parallel.sharding import make_sharded_decode
    mesh = make_mesh(cfg8.mesh, num_data=8, num_model=1)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(16, cfg.data.num_frames,
                                         cfg.data.feature_dim)), jnp.float32)
    with mesh:
        fn = make_sharded_decode(model, cfg8, mesh, method="beam",
                                 beam_width=3)
        toks = np.asarray(fn(params, feats))
    assert toks.shape[0] == 16
    assert toks.min() >= 0 and toks.max() < ds.vocab.size


def test_captioner_flag_decodes_valid_tokens(setup):
    """The public surface: Captioner with the flag on beam-decodes tokens
    that are always inside the real vocab (padding never emitted)."""
    cfg, ds, model, params = setup
    cfg8 = cfg.replace(decode=dataclasses.replace(
        cfg.decode, int8_vocab_projection=True, method="beam"))
    from vidcap_tpu.inference import Captioner
    cap = Captioner(cfg8, model, params, ds)
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(4, cfg.data.num_frames,
                             cfg.data.feature_dim)).astype(np.float32)
    toks = np.asarray(cap.decode_batch(feats, method="beam", beam_width=3))
    assert toks.shape == (4, cfg.decode.max_len)
    assert toks.min() >= 0 and toks.max() < ds.vocab.size
