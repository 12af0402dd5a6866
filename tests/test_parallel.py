"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4.3):
DP-sharded step == single-device step; TP seam compiles and matches."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu.models.model import create_model, init_params
from vidcap_tpu.parallel.mesh import make_mesh
from vidcap_tpu.parallel.sharding import (make_sharded_xe_step, param_specs,
                                          place_state, shard_batch)
from vidcap_tpu.train.loop import batch_to_device_dict
from vidcap_tpu.train.state import create_train_state
from vidcap_tpu.train.steps import make_xe_step


pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _setup(tiny_cfg, tiny_dataset, batch_size):
    cfg = dataclasses.replace(
        tiny_cfg, train=dataclasses.replace(tiny_cfg.train,
                                            batch_size=batch_size,
                                            donate_state=False))
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    return cfg, model, params


def test_dp_step_matches_single_device(tiny_cfg, tiny_dataset):
    cfg, model, params = _setup(tiny_cfg, tiny_dataset, batch_size=16)
    batch = batch_to_device_dict(next(tiny_dataset.batches(16, seed=3)))

    # single-device reference
    state1 = create_train_state(cfg, params)
    step1 = make_xe_step(model, cfg)
    state1, m1 = step1(state1, batch)

    # 8-way DP
    from __graft_entry__ import _unjitted_xe_body
    mesh = make_mesh(cfg.mesh, num_data=8, num_model=1)
    with mesh:
        state8 = place_state(create_train_state(cfg, params), mesh)
        step8 = make_sharded_xe_step(model, cfg, mesh,
                                     _unjitted_xe_body(model, cfg))
        state8, m8 = step8(state8, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    # Adam flips the sign of near-zero grads (update = ±lr), so compare params
    # with atol ≳ 2·lr and additionally compare raw gradients tightly below
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)

    # raw-grad equivalence: DP psum-averaged grads == single-device grads
    from vidcap_tpu.models.model import VidCapModel
    from vidcap_tpu.objectives.xe import masked_xe_loss, shift_right
    from jax.sharding import NamedSharding, PartitionSpec as P

    def loss_fn(p, b):
        logits = model.apply({"params": p}, b["features"], None,
                             shift_right(b["tokens"]),
                             method=VidCapModel.xe_logits)
        return masked_xe_loss(logits, b["tokens"], b["mask"])[0]

    g1 = jax.jit(jax.grad(loss_fn))(params, batch)
    with mesh:
        sharded = shard_batch(batch, mesh)
        g8 = jax.jit(jax.grad(loss_fn))(
            jax.device_put(params, NamedSharding(mesh, P())), sharded)
    # bf16 matmuls + different contraction splits bound agreement to ~bf16 eps;
    # this still catches structural DP bugs (a missing mean is 8x off)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.05, np.abs(a - b).max()


def test_tp_vocab_seam_compiles_and_matches(tiny_cfg, tiny_dataset):
    cfg, model, params = _setup(tiny_cfg, tiny_dataset, batch_size=8)
    batch = batch_to_device_dict(next(tiny_dataset.batches(8, seed=4)))

    state1 = create_train_state(cfg, params)
    step1 = make_xe_step(model, cfg)
    state1, m1 = step1(state1, batch)

    from __graft_entry__ import _unjitted_xe_body
    mesh = make_mesh(cfg.mesh, num_data=4, num_model=2)
    specs = param_specs(params, mesh)
    flat = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: hasattr(x, "index") or x is None)
    with mesh:
        state_tp = place_state(create_train_state(cfg, params), mesh)
        step_tp = make_sharded_xe_step(model, cfg, mesh,
                                       _unjitted_xe_body(model, cfg))
        state_tp, m_tp = step_tp(state_tp, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m_tp["loss"]),
                               rtol=1e-5)


def test_dryrun_multichip_entry():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_graft_entry_compiles():
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0]


def test_sharded_decode_matches_single_device(tiny_cfg, tiny_dataset):
    """Multi-chip serving: the GSPMD data-sharded beam/greedy decode returns
    token-identical captions to the single-device Captioner path."""
    from vidcap_tpu.models.decoding import (beam_decode, greedy_decode,
                                            tile_recurrent)
    from vidcap_tpu.models.model import VidCapModel
    from vidcap_tpu.parallel.sharding import make_sharded_decode

    cfg, model, params = _setup(tiny_cfg, tiny_dataset, batch_size=16)
    V = tiny_dataset.vocab.size
    B = 16
    feats = jnp.asarray(
        np.random.default_rng(7).normal(
            size=(B, cfg.data.num_frames, cfg.data.feature_dim)), jnp.float32)

    # single-device references
    bf16 = cfg.model.compute_dtype == "bfloat16"
    state = model.apply({"params": params}, feats,
                        method=VidCapModel.init_state)
    ref_greedy = greedy_decode(
        lambda st, t: model.apply({"params": params}, st, t, bf16,
                                  method=VidCapModel.step),
        state, B, cfg.decode.max_len, with_logp=False).tokens
    state = tile_recurrent(
        model.apply({"params": params}, feats, method=VidCapModel.init_state),
        3)
    ref_beam, _ = beam_decode(
        lambda st, t: model.apply({"params": params}, st, t, 3, bf16,
                                  method=VidCapModel.step_beam),
        state, batch=B, max_len=cfg.decode.max_len, beam_width=3)

    # GSPMD compiles the per-shard program with different fusion choices than
    # the unsharded one, so bf16 rounding can flip an argmax on the odd row of
    # an untrained model (measured: 15/16 rows identical, all mesh shapes
    # agreeing with each other 16/16). Contract: sharded outputs are
    # deterministic, EXACTLY consistent across mesh shapes, and ≥ 7/8 of rows
    # match the unsharded compile.
    outs = {}
    for nd, nm in ((8, 1), (4, 2)):    # pure DP + composed vocab-TP seam
        mesh = make_mesh(cfg.mesh, num_data=nd, num_model=nm)
        with mesh:
            g = make_sharded_decode(model, cfg, mesh, method="greedy")
            b = make_sharded_decode(model, cfg, mesh, method="beam",
                                    beam_width=3)
            outs[(nd, nm)] = (np.asarray(g(params, feats)),
                              np.asarray(b(params, feats)))

    (g8, b8), (g4, b4) = outs[(8, 1)], outs[(4, 2)]
    np.testing.assert_array_equal(g8, g4)
    np.testing.assert_array_equal(b8, b4)
    g_rows = (g8 == np.asarray(ref_greedy)).all(axis=1).sum()
    b_rows = (b8 == np.asarray(ref_beam)).all(axis=1).sum()
    assert g_rows >= B - B // 8, (g_rows, B)
    assert b_rows >= B - B // 8, (b_rows, B)


def test_captioner_mesh_routing(tiny_cfg, tiny_dataset):
    """Captioner(mesh=...) routes greedy/beam through the GSPMD sharded decode
    (frame masks included); sampling stays on the single-device path."""
    from vidcap_tpu.inference import Captioner

    mesh = make_mesh(tiny_cfg.mesh, num_data=8, num_model=1)
    cap = Captioner.from_checkpoint(tiny_cfg, tiny_dataset,
                                    checkpoint_dir=None, seed=0, mesh=mesh)
    B = 16
    feats = np.asarray(
        np.random.default_rng(11).normal(
            size=(B, tiny_cfg.data.num_frames, tiny_cfg.data.feature_dim)),
        np.float32)
    mask = np.ones((B, tiny_cfg.data.num_frames), np.float32)
    mask[0, 1:] = 0.0                     # short input: 1 real frame

    g = cap.decode_batch(feats, method="greedy", frame_mask=mask)
    b = cap.decode_batch(feats, method="beam", beam_width=3, frame_mask=mask)
    s = cap.decode_batch(feats, method="sample", frame_mask=mask)
    assert g.shape == b.shape == s.shape == (B, tiny_cfg.decode.max_len)
    assert any(k[0] == "sharded" for k in cap._compiled)
    assert ("sharded", "sample", B, 5) not in cap._compiled
    # deterministic across calls
    np.testing.assert_array_equal(
        g, cap.decode_batch(feats, method="greedy", frame_mask=mask))
