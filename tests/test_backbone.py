"""Inception-ResNet-v2 backbone (SURVEY.md C2) + e2e wiring (configs[2]):
shape/grid checks on a width-reduced variant (CPU-friendly), weight save/load
roundtrip, and a full e2e train step through the CNN."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu.models.backbone import (InceptionResNetV2, save_backbone_params)


TINY = dict(width_mult=0.0625, depth=(1, 1, 1))


def test_backbone_output_shape():
    bb = InceptionResNetV2(**TINY)
    x = jnp.zeros((2, 299, 299, 3))
    params = bb.init(jax.random.key(0), x)["params"]
    out = bb.apply({"params": params}, x)
    assert out.shape == (2, max(int(1536 * 0.0625), 8))
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_backbone_remat_stride_is_pure_memory_knob():
    """remat_every changes ONLY where nn.checkpoint wraps blocks: the param
    tree and the outputs (fwd AND grads) must be identical across strides."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 149, 149, 3)),
                    jnp.float32)
    ref_params = None
    ref_out = None
    ref_gnorm = None
    for stride in (1, 2, 0):
        bb = InceptionResNetV2(**TINY, remat_every=stride)
        params = bb.init(jax.random.key(0), x)["params"]
        out = bb.apply({"params": params}, x)
        gnorm = jax.grad(
            lambda p: bb.apply({"params": p}, x).sum())(params)
        gn = float(jnp.sqrt(sum(jnp.sum(jnp.square(g).astype(jnp.float32))
                                for g in jax.tree_util.tree_leaves(gnorm))))
        if ref_params is None:
            ref_params, ref_out, ref_gnorm = params, out, gn
            continue
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(ref_params))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=1e-5)
        np.testing.assert_allclose(gn, ref_gnorm, rtol=1e-4)


def test_backbone_works_on_smaller_inputs():
    # 149x149 input still produces a valid pooled vector (global pool at the end)
    bb = InceptionResNetV2(**TINY)
    x = jnp.zeros((1, 149, 149, 3))
    params = bb.init(jax.random.key(0), x)["params"]
    out = bb.apply({"params": params}, x)
    assert out.ndim == 2 and np.isfinite(np.asarray(out)).all()


def test_backbone_save_load_roundtrip(tmp_path):
    bb = InceptionResNetV2(**TINY)
    x = jnp.ones((1, 149, 149, 3))
    params = bb.init(jax.random.key(0), x)["params"]
    p = str(tmp_path / "w.npz")
    save_backbone_params(params, p)

    import flax
    flat = dict(np.load(p))
    restored = flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
    a = bb.apply({"params": params}, x)
    b = bb.apply({"params": restored}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_e2e_train_step_through_backbone(tiny_cfg, tiny_dataset, monkeypatch):
    """configs[2]: pixels → backbone → decoder, one XE step with grads into the CNN."""
    from vidcap_tpu.models import backbone as bb_mod
    from vidcap_tpu.models.model import create_model, init_params
    from vidcap_tpu.train.state import create_train_state
    from vidcap_tpu.train.steps import make_xe_step

    # shrink the backbone for CPU
    orig = bb_mod.InceptionResNetV2
    monkeypatch.setattr(
        bb_mod, "InceptionResNetV2",
        lambda **kw: orig(width_mult=0.0625, depth=(1, 1, 1), **kw))

    cfg = dataclasses.replace(
        tiny_cfg,
        data=dataclasses.replace(tiny_cfg.data, num_frames=2, frame_size=149,
                                 feature_dim=96),  # 1536*0.0625
        model=dataclasses.replace(tiny_cfg.model, use_backbone=True),
        train=dataclasses.replace(tiny_cfg.train, stage="e2e", batch_size=2,
                                  donate_state=False))

    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    state = create_train_state(cfg, params)
    step = make_xe_step(model, cfg)

    B, T, L = 2, 2, cfg.data.max_caption_len
    rng = np.random.default_rng(0)
    batch = {
        "features": jnp.asarray(rng.normal(size=(B, T, 149, 149, 3)),
                                jnp.float32),
        "tokens": jnp.asarray(rng.integers(4, 40, size=(B, L)), jnp.int32),
        "mask": jnp.ones((B, L), jnp.float32),
        "attributes": jnp.zeros((B, cfg.data.num_attributes), jnp.float32),
        "video_idx": jnp.zeros((B,), jnp.int32),
    }
    new_state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # gradients must reach the backbone
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["backbone"], new_state.params["backbone"])
    assert max(jax.tree_util.tree_leaves(diff)) > 0
