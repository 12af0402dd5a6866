"""Decoder model unit tests (SURVEY.md §4.2): scan-vs-step parity, shapes, learning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu.models.model import VidCapModel, create_model, init_params
from vidcap_tpu.objectives import masked_xe_loss, shift_right


@pytest.fixture(scope="module")
def model_and_params(tiny_cfg):
    model = create_model(tiny_cfg, vocab_size=100)
    params = init_params(model, tiny_cfg, jax.random.key(0))
    return model, params


def test_xe_logits_shape(tiny_cfg, model_and_params):
    model, params = model_and_params
    B, T, D = 4, tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim
    L = tiny_cfg.data.max_caption_len
    feats = jnp.ones((B, T, D))
    inputs = jnp.ones((B, L), jnp.int32)
    logits = model.apply({"params": params}, feats, None, inputs,
                         method=VidCapModel.xe_logits)
    assert logits.shape == (B, L, 256)  # padded vocab
    assert logits.dtype == jnp.float32


def test_scan_matches_manual_stepping(tiny_cfg, model_and_params):
    """The lax.scan XE path must produce the same logits as stepping manually —
    guards the precomputed-embeddings/keys optimization (SURVEY.md §3.1)."""
    model, params = model_and_params
    B, T, D = 3, tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim
    L = 5
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    inputs = jnp.asarray(rng.integers(1, 90, size=(B, L)), jnp.int32)

    scan_logits = model.apply({"params": params}, feats, None, inputs,
                              method=VidCapModel.xe_logits)

    state = model.apply({"params": params}, feats, method=VidCapModel.init_state)
    outs = []
    for t in range(L):
        state, lg = model.apply({"params": params}, state, inputs[:, t],
                                method=VidCapModel.step)
        outs.append(lg)
    step_logits = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(scan_logits, step_logits, rtol=2e-5, atol=2e-5)


def test_padded_vocab_masked(tiny_cfg, model_and_params):
    model, params = model_and_params
    feats = jnp.ones((2, tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim))
    state = model.apply({"params": params}, feats, method=VidCapModel.init_state)
    _, logits = model.apply({"params": params}, state,
                            jnp.zeros((2,), jnp.int32), method=VidCapModel.step)
    assert float(logits[:, 100:].max()) < -1e29  # ids >= vocab_size impossible


def test_masked_xe_loss_ignores_pad():
    B, L, V = 2, 4, 10
    logits = jnp.zeros((B, L, V))
    targets = jnp.ones((B, L), jnp.int32)
    full_mask = jnp.ones((B, L))
    half_mask = jnp.array([[1, 1, 0, 0], [1, 1, 0, 0]], jnp.float32)
    l1, _ = masked_xe_loss(logits, targets, full_mask)
    l2, _ = masked_xe_loss(logits, targets, half_mask)
    # uniform logits → per-token loss is log(V) regardless of mask
    np.testing.assert_allclose(l1, np.log(V), rtol=1e-6)
    np.testing.assert_allclose(l2, np.log(V), rtol=1e-6)
    # but a masked token with extreme logits must not affect the loss
    bad = logits.at[:, 2, 1].set(-100.0)
    l3, _ = masked_xe_loss(bad, targets, half_mask)
    np.testing.assert_allclose(l3, l2, rtol=1e-6)


def test_shift_right():
    toks = jnp.array([[5, 6, 7]], jnp.int32)
    np.testing.assert_array_equal(shift_right(toks), [[1, 5, 6]])  # BOS=1


def test_attribute_head_shape(tiny_cfg, model_and_params):
    model, params = model_and_params
    feats = jnp.ones((4, tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim))
    attr = model.apply({"params": params}, feats,
                       method=VidCapModel.attribute_logits)
    assert attr.shape == (4, tiny_cfg.data.num_attributes)


def test_two_layer_decoder(tiny_cfg):
    """Multi-layer LSTM stacks (cfg.num_lstm_layers>1) keep scan/step parity."""
    import dataclasses
    cfg = dataclasses.replace(
        tiny_cfg, model=dataclasses.replace(tiny_cfg.model, num_lstm_layers=2))
    model = create_model(cfg, vocab_size=50)
    params = init_params(model, cfg, jax.random.key(0))
    B, T, D, L = 2, cfg.data.num_frames, cfg.data.feature_dim, 4
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    inputs = jnp.asarray(rng.integers(1, 40, size=(B, L)), jnp.int32)

    scan_logits = model.apply({"params": params}, feats, None, inputs,
                              method=VidCapModel.xe_logits)
    state = model.apply({"params": params}, feats,
                        method=VidCapModel.init_state)
    assert state.h.shape[0] == 2          # two recurrent layers
    outs = []
    for t in range(L):
        state, lg = model.apply({"params": params}, state, inputs[:, t],
                                method=VidCapModel.step)
        outs.append(lg)
    np.testing.assert_allclose(scan_logits, jnp.stack(outs, 1),
                               rtol=2e-5, atol=2e-5)


def test_vocab_mask_bias_fold_equivalence(tiny_cfg, tiny_dataset):
    """skip_vocab_mask=True with the -1e30 mask pre-folded into out_proj.bias
    produces bit-identical logits to the per-step where (decoder._lstm_logits
    docstring argument: |x·W| rounds away against -1e30 in f32 and bf16)."""
    import copy
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params

    cfg = tiny_cfg
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(2))
    V = tiny_dataset.vocab.size
    B, K = 4, 3
    feats = jnp.asarray(
        np.random.default_rng(9).normal(
            size=(B, cfg.data.num_frames, cfg.data.feature_dim)), jnp.float32)

    from vidcap_tpu.models.decoding import tile_recurrent
    state = tile_recurrent(
        model.apply({"params": params}, feats, method=VidCapModel.init_state),
        K)
    tok = jnp.zeros((B * K,), jnp.int32)

    _, logits_where = model.apply({"params": params}, state, tok, K, True,
                                  method=VidCapModel.step_beam)

    folded = copy.deepcopy(params)
    folded["decoder"]["out_proj"]["bias"] = (
        folded["decoder"]["out_proj"]["bias"].at[V:].set(-1e30))
    _, logits_fold = model.apply({"params": folded}, state, tok, K, True, True,
                                 method=VidCapModel.step_beam)
    np.testing.assert_array_equal(np.asarray(logits_where),
                                  np.asarray(logits_fold))


def test_lstm_cell_matches_numpy_oracle():
    """SURVEY §4.2: the fused-gate LSTM cell vs a hand-rolled numpy LSTM with
    the same (i, f, g, o) gate layout and the reference-style +1 forget bias."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vidcap_tpu.models.decoder import LSTMCell

    H, E, B = 5, 7, 3
    cell = LSTMCell(hidden_dim=H, compute_dtype=jnp.float32)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(B, E)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    params = cell.init(jax.random.key(0), x, h0, c0)["params"]
    h1, c1 = cell.apply({"params": params}, x, h0, c0)

    def sigmoid(z):
        return 1.0 / (1.0 + np.exp(-z))

    w = np.asarray(params["w"])             # [(E+H), 4H]
    b = np.asarray(params["b"])
    gates = np.concatenate([np.asarray(x), np.asarray(h0)], -1) @ w + b
    i, f, g, o = np.split(gates, 4, axis=-1)
    c_ref = sigmoid(f + 1.0) * np.asarray(c0) + sigmoid(i) * np.tanh(g)
    h_ref = sigmoid(o) * np.tanh(c_ref)
    np.testing.assert_allclose(np.asarray(c1), c_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), h_ref, rtol=1e-5, atol=1e-6)


def test_temporal_attention_matches_numpy_oracle():
    """SURVEY §4.2: Bahdanau attention scores/softmax/context vs hand-rolled
    numpy (f32 compute dtype so the oracle is exact to float tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vidcap_tpu.models.decoder import TemporalAttention

    B, T, H, A, Dv = 3, 5, 6, 4, 7
    attn = TemporalAttention(attn_dim=A, compute_dtype=jnp.float32)
    rng = np.random.default_rng(23)
    h = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, T, A)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(B, T, Dv)), jnp.float32)
    mask = jnp.asarray((rng.random((B, T)) > 0.3).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)           # ≥1 valid frame per row
    params = attn.init(jax.random.key(1), h, keys, values, mask)["params"]
    ctx, a = attn.apply({"params": params}, h, keys, values, mask)

    wq = np.asarray(params["query"]["kernel"])
    u = np.asarray(params["u"])
    q = np.asarray(h) @ wq                                    # [B, A]
    scores = np.tanh(np.asarray(keys) + q[:, None, :]) @ u    # [B, T]
    scores = np.where(np.asarray(mask) > 0, scores, -1e30)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    w = e / e.sum(-1, keepdims=True)
    ctx_ref = np.einsum("bt,btd->bd", w, np.asarray(values))
    np.testing.assert_allclose(np.asarray(a), w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ctx), ctx_ref, rtol=1e-5, atol=1e-6)
