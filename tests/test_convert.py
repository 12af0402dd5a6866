"""Checkpoint-converter self-tests (SURVEY.md §4.1; VERDICT r1 missing #2).

No real reference checkpoint exists offline (/root/reference is empty), so
these tests round-trip SYNTHETIC slim/TF1-named checkpoints built from the
flax templates: they prove the name map covers every parameter, the BN fold
is numerically exact (invertible), and the LSTM gate permutation matches a
hand-rolled TF BasicLSTMCell.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu import convert
from vidcap_tpu.models.backbone import InceptionResNetV2

DEPTH = (2, 2, 2)  # tiny variant: same naming schema, fast init


@pytest.fixture(scope="module")
def tiny_backbone():
    bb = InceptionResNetV2(compute_dtype=jnp.float32, width_mult=0.25,
                           depth=DEPTH)
    dummy = jnp.zeros((1, 75, 75, 3), jnp.float32)
    params = jax.tree_util.tree_map(
        np.asarray, bb.init(jax.random.key(0), dummy)["params"])
    return bb, params, dummy


def _synthetic_slim_ckpt(params, rng):
    """Build slim-named variables that, when converted, must reproduce
    `params` exactly — the BN fold is inverted analytically (gamma absent →
    scale = 1/sqrt(var+eps) → var = 1/scale² - eps; offset = beta - mean*scale
    with mean=0 → beta = offset)."""
    name_map = convert.irv2_slim_name_map(DEPTH)
    tf_vars = {}
    for flax_path, slim in name_map.items():
        node = params
        for part in flax_path.split("/"):
            node = node[part]
        kernel = node["conv"]["kernel"]
        scale, offset = node["bn_scale"], node["bn_offset"]
        base = f"{convert.SLIM_PREFIX}/{slim}"
        tf_vars[f"{base}/weights"] = np.asarray(kernel)
        if flax_path.endswith("/up"):
            # slim residual up-projections: bias, no BN
            assert np.allclose(scale, 1.0), "template init scale must be 1"
            tf_vars[f"{base}/biases"] = np.asarray(offset)
        else:
            var = 1.0 / np.maximum(np.asarray(scale), 1e-6) ** 2 - convert.BN_EPS
            tf_vars[f"{base}/BatchNorm/moving_variance"] = var.astype(np.float64)
            tf_vars[f"{base}/BatchNorm/moving_mean"] = np.zeros_like(scale)
            tf_vars[f"{base}/BatchNorm/beta"] = np.asarray(offset)
    return tf_vars


def test_irv2_name_map_covers_template(tiny_backbone):
    """Every ConvBN module in the flax tree appears in the name map and
    vice versa — no silently unconverted parameters."""
    _, params, _ = tiny_backbone
    name_map = convert.irv2_slim_name_map(DEPTH)
    flat = set()

    def walk(node, path):
        if "conv" in node and "bn_scale" in node:
            flat.add("/".join(path))
            return
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + [k])

    walk(params, [])
    assert flat == set(name_map), (
        f"map-only: {set(name_map) - flat}; tree-only: {flat - set(name_map)}")


def test_irv2_roundtrip_forward_equal(tiny_backbone):
    """Synthetic slim ckpt built from random flax params converts back to a
    forward-identical backbone (BN fold exactness, f32)."""
    bb, params, dummy = tiny_backbone
    # randomize so the test can't pass vacuously on init values
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda a: (rng.normal(size=a.shape).astype(np.float32) * 0.1
                   if a.ndim > 0 else a), params)

    def fix_scales(node):
        # gamma-less slim BN folds to a strictly POSITIVE scale; up-projection
        # (bias, no BN) folds to exactly 1
        for k, v in node.items():
            if isinstance(v, dict):
                if "bn_scale" in v:
                    v["bn_scale"] = (np.abs(v["bn_scale"]) + 0.5
                                     ).astype(np.float32)
                    if k == "up":
                        v["bn_scale"] = np.ones_like(v["bn_scale"])
                else:
                    fix_scales(v)

    fix_scales(params)
    tf_vars = _synthetic_slim_ckpt(params, rng)
    converted = convert.convert_irv2(tf_vars, params)

    x = jnp.asarray(rng.normal(size=(2, 75, 75, 3)), jnp.float32)
    a = bb.apply({"params": params}, x)
    b = bb.apply({"params": converted}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_irv2_missing_and_mismatch_errors(tiny_backbone):
    _, params, _ = tiny_backbone
    rng = np.random.default_rng(1)
    tf_vars = _synthetic_slim_ckpt(params, rng)
    incomplete = dict(tf_vars)
    victims = [k for k in incomplete if k.endswith("/weights")][:3]
    for v in victims:
        del incomplete[v]
    with pytest.raises(KeyError, match="absent"):
        convert.convert_irv2(incomplete, params)

    bad = dict(tf_vars)
    k = next(k for k in bad if k.endswith("/weights"))
    bad[k] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError, match="shape"):
        convert.convert_irv2(bad, params)


def test_lstm_gate_permutation():
    """Converted TF BasicLSTMCell weights drive decoder.py's LSTMCell to the
    exact TF cell output (f32): gate order (i,j,f,o) → (i,f,g,o), forget
    bias +1 on both sides."""
    from vidcap_tpu.models.decoder import LSTMCell
    H, IN, B = 8, 5, 3
    rng = np.random.default_rng(2)
    w_tf = rng.normal(size=(IN + H, 4 * H)).astype(np.float32)
    b_tf = rng.normal(size=(4 * H,)).astype(np.float32)
    x = rng.normal(size=(B, IN)).astype(np.float32)
    h = rng.normal(size=(B, H)).astype(np.float32)
    c = rng.normal(size=(B, H)).astype(np.float32)

    # numpy oracle of tf.nn.rnn_cell.BasicLSTMCell(forget_bias=1.0)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    gates = np.concatenate([x, h], -1) @ w_tf + b_tf
    i, j, f, o = np.split(gates, 4, axis=-1)
    c_tf = sig(f + 1.0) * c + sig(i) * np.tanh(j)
    h_tf = sig(o) * np.tanh(c_tf)

    w_fx, b_fx = convert.tf_lstm_gates_to_flax(w_tf, b_tf)
    cell = LSTMCell(hidden_dim=H, compute_dtype=jnp.float32)
    h_out, c_out = cell.apply(
        {"params": {"w": jnp.asarray(w_fx), "b": jnp.asarray(b_fx)}},
        jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(h_out), h_tf, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), c_tf, rtol=1e-5, atol=1e-6)


def test_decoder_convert_roundtrip(tiny_cfg, tiny_dataset):
    """TF1-named decoder variables land in the right flax slots, vocab-padded
    axes fill only the true-vocab rows, and greedy decode with converted
    params differs from init (weights actually applied)."""
    from vidcap_tpu.inference import Captioner
    from vidcap_tpu.models.model import create_model, init_params

    V = tiny_dataset.vocab.size
    model = create_model(tiny_cfg, vocab_size=V)
    params = init_params(model, tiny_cfg, jax.random.key(0))
    dec_t = jax.tree_util.tree_map(np.asarray, params["decoder"])

    rng = np.random.default_rng(3)
    H = tiny_cfg.model.hidden_dim
    E = tiny_cfg.model.embed_dim
    A = tiny_cfg.model.attn_dim
    D = tiny_cfg.data.feature_dim
    in_dim = dec_t["lstm0"]["w"].shape[0] - H
    tf_vars = {
        "Wemb": rng.normal(size=(V, E)).astype(np.float32),
        "lstm/basic_lstm_cell/kernel":
            rng.normal(size=(in_dim + H, 4 * H)).astype(np.float32) * 0.1,
        "lstm/basic_lstm_cell/bias":
            rng.normal(size=(4 * H,)).astype(np.float32),
        "embed_word_W": rng.normal(size=(H, V)).astype(np.float32) * 0.1,
        "embed_word_b": rng.normal(size=(V,)).astype(np.float32),
        "encode_image_W": rng.normal(size=(D, H)).astype(np.float32) * 0.1,
        "encode_image_b": rng.normal(size=(H,)).astype(np.float32),
        "attention/key_W": rng.normal(size=(H, A)).astype(np.float32),
        "attention/query_W": rng.normal(size=(H, A)).astype(np.float32),
        "attention/v": rng.normal(size=(A, 1)).astype(np.float32),
        "init_state_W": rng.normal(
            size=dec_t["init_proj"]["kernel"].shape).astype(np.float32),
        "init_state_b": rng.normal(
            size=dec_t["init_proj"]["bias"].shape).astype(np.float32),
    }
    dec_c = convert.convert_decoder(tf_vars, dec_t, vocab_size=V)

    np.testing.assert_array_equal(dec_c["embed"]["embedding"][:V],
                                  tf_vars["Wemb"])
    # padded rows untouched
    np.testing.assert_array_equal(dec_c["embed"]["embedding"][V:],
                                  dec_t["embed"]["embedding"][V:])
    np.testing.assert_array_equal(dec_c["out_proj"]["kernel"][:, :V],
                                  tf_vars["embed_word_W"])
    w_fx, _ = convert.tf_lstm_gates_to_flax(
        tf_vars["lstm/basic_lstm_cell/kernel"],
        tf_vars["lstm/basic_lstm_cell/bias"])
    np.testing.assert_array_equal(dec_c["lstm0"]["w"], w_fx)
    np.testing.assert_array_equal(dec_c["attention"]["u"],
                                  tf_vars["attention/v"].reshape(-1))

    # converted weights actually change decode output
    params2 = dict(params)
    params2["decoder"] = jax.tree_util.tree_map(jnp.asarray, dec_c)
    feats = jnp.asarray(rng.normal(
        size=(4, tiny_cfg.data.num_frames, D)), jnp.float32)
    cap_a = Captioner(tiny_cfg, model, params, tiny_dataset)
    cap_b = Captioner(tiny_cfg, model, params2, tiny_dataset)
    ta = cap_a.decode_batch(np.asarray(feats))
    tb = cap_b.decode_batch(np.asarray(feats))
    assert not np.array_equal(ta, tb)


def test_read_tf_checkpoint_formats(tmp_path):
    """Reads both .npz archives and real TF checkpoints (written with TF2's
    compat.v1 Saver, the reference's format)."""
    arrs = {"a/b": np.arange(6, dtype=np.float32).reshape(2, 3),
            "c": np.ones(4, np.float32)}
    npz = tmp_path / "w.npz"
    np.savez(npz, **arrs)
    got = convert.read_tf_checkpoint(str(npz))
    np.testing.assert_array_equal(got["a/b"], arrs["a/b"])

    tf = pytest.importorskip("tensorflow")
    ckpt = str(tmp_path / "model.ckpt")
    with tf.Graph().as_default():
        v1 = tf.compat.v1.get_variable(
            "x/kernel", initializer=arrs["a/b"])
        v2 = tf.compat.v1.get_variable("bias", initializer=arrs["c"])
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, ckpt)
    got = convert.read_tf_checkpoint(ckpt)
    np.testing.assert_array_equal(got["x/kernel"], arrs["a/b"])
    np.testing.assert_array_equal(got["bias"], arrs["c"])


def test_irv2_convert_empty_prefix(tiny_backbone):
    """Review r2 finding 5 regression: with prefix='' (archives whose names
    omit the InceptionResnetV2/ scope) the BN presence probes must build keys
    the same way get() does — the old f"{prefix}/{scope}" probe produced a
    leading slash, misrouting every BN conv to the bias branch."""
    bb, params, dummy = tiny_backbone
    rng = np.random.default_rng(4)
    tf_vars = _synthetic_slim_ckpt(params, rng)
    stripped = {k[len(convert.SLIM_PREFIX) + 1:]: v for k, v in tf_vars.items()}
    converted = convert.convert_irv2(stripped, params, prefix="")
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(converted)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
