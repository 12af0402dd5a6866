"""The COMPOSED flagship stage (VERDICT r3 next #1; SURVEY.md §0.5 stage 3,
§3.5; BASELINE north_star "multitask XE+RL loss"): RL through the CNN with
multitask regularization, with the backbone encoded EXACTLY ONCE per step.

Three guarantees frozen here:
  1. the backbone is traced once per SCST step even with the attribute head,
     the XE anchor, and both rollouts all consuming features (shared encode);
  2. turning the auxiliary losses on adds ZERO convolutions to the step jaxpr
     (they ride the shared encode instead of re-running the CNN);
  3. PG + attr + XE-anchor gradients all reach the CNN, and the composed
     preset trains through the real train() loop on a pixels corpus.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu.models.model import create_model, init_params
from vidcap_tpu.train.scst import make_scst_step, make_scst_step_body
from vidcap_tpu.train.state import create_train_state
from vidcap_tpu.objectives.reward_tables import tables_from_dataset


def _tiny_e2e_cfg(tiny_cfg, **train_kw):
    """synthetic_tiny reshaped for a 1/16-width, depth-(1,1,1) IRv2."""
    return dataclasses.replace(
        tiny_cfg,
        data=dataclasses.replace(tiny_cfg.data, num_frames=2, frame_size=149,
                                 feature_dim=96),
        model=dataclasses.replace(tiny_cfg.model, use_backbone=True,
                                  use_pallas_decoder=False),
        train=dataclasses.replace(tiny_cfg.train, stage="scst",
                                  scst_learning_rate=1e-4, batch_size=2,
                                  donate_state=False, **train_kw))


@pytest.fixture()
def tiny_backbone(monkeypatch):
    from vidcap_tpu.models import backbone as bb_mod
    orig = bb_mod.InceptionResNetV2
    monkeypatch.setattr(
        bb_mod, "InceptionResNetV2",
        lambda **kw: orig(width_mult=0.0625, depth=(1, 1, 1), **kw))
    return bb_mod


def _pixel_batch(cfg, dataset, B=2, seed=0):
    rng = np.random.default_rng(seed)
    T, S = cfg.data.num_frames, cfg.data.frame_size
    return {
        "features": jnp.asarray(rng.normal(size=(B, T, S, S, 3)), jnp.float32),
        "tokens": jnp.asarray(rng.integers(3, dataset.vocab.size,
                                           size=(B, cfg.data.max_caption_len)),
                              jnp.int32),
        "mask": jnp.ones((B, cfg.data.max_caption_len), jnp.float32),
        "attributes": (rng.random((B, cfg.data.num_attributes)) < 0.1
                       ).astype(np.float32),
        "video_idx": jnp.asarray(rng.integers(0, dataset.num_videos, size=(B,)),
                                 jnp.int32),
    }


def _count_convs(jaxpr) -> int:
    """Recursively count conv_general_dilated equations (through remat/pjit/
    scan/cond sub-jaxprs) — a trace-level census of backbone executions."""
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            n += 1
        for v in eqn.params.values():
            for sub in (v if isinstance(v, (list, tuple)) else [v]):
                inner = getattr(sub, "jaxpr", None)
                if inner is not None:
                    n += _count_convs(inner)
                elif hasattr(sub, "eqns"):
                    n += _count_convs(sub)
    return n


def test_backbone_traced_once_composed_scst(tiny_cfg, tiny_dataset,
                                            tiny_backbone):
    """The composed step (PG + attr head + XE anchor, fused rollouts) contains
    exactly ONE differentiated backbone encode: its jaxpr's convolution count
    equals that of a lone value_and_grad'd encode_features call (the decoder
    has no convs, so every conv in the step comes from the CNN) — VERDICT r3
    weak #1."""
    cfg = _tiny_e2e_cfg(tiny_cfg, attribute_loss_weight=0.2, scst_xe_mix=0.1)
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    state = create_train_state(cfg, params)
    tables = tables_from_dataset(tiny_dataset)
    body = make_scst_step_body(model, cfg, tables=tables)
    batch = _pixel_batch(cfg, tiny_dataset)
    step_convs = _count_convs(jax.make_jaxpr(body)(state, batch).jaxpr)

    from vidcap_tpu.models.model import VidCapModel

    def one_encode(params, pixels):
        feats = model.apply({"params": params}, pixels,
                            method=VidCapModel.encode_features)
        return jnp.sum(feats.astype(jnp.float32))

    ref_convs = _count_convs(jax.make_jaxpr(
        jax.value_and_grad(one_encode))(params, batch["features"]).jaxpr)
    assert ref_convs > 0
    assert step_convs == ref_convs, (
        f"composed SCST step has {step_convs} convs vs {ref_convs} for a "
        f"single fwd+bwd encode — the backbone runs more than once")


def test_aux_losses_add_zero_convs(tiny_cfg, tiny_dataset, tiny_backbone):
    """Turning on the attribute head + XE anchor adds no convolutions to the
    step jaxpr: the auxiliary losses consume the SAME encode, so the composed
    flagship pays one backbone fwd+bwd, not up to four (VERDICT r3 weak #1)."""
    tables = tables_from_dataset(tiny_dataset)

    def convs_for(**train_kw):
        cfg = _tiny_e2e_cfg(tiny_cfg, **train_kw)
        model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
        params = init_params(model, cfg, jax.random.key(0))
        state = create_train_state(cfg, params)
        body = make_scst_step_body(model, cfg, tables=tables)
        batch = _pixel_batch(cfg, tiny_dataset)
        return _count_convs(jax.make_jaxpr(body)(state, batch).jaxpr)

    plain = convs_for(attribute_loss_weight=0.0, scst_xe_mix=0.0)
    composed = convs_for(attribute_loss_weight=0.2, scst_xe_mix=0.1)
    assert plain > 0
    assert composed == plain, (
        f"composed step has {composed} convs vs {plain} without aux losses — "
        f"an extra backbone encode sneaked in")


def test_composed_grads_reach_backbone(tiny_cfg, tiny_dataset, tiny_backbone):
    """One composed step: finite loss, all three loss terms present, and the
    CNN parameters actually move under the combined gradient."""
    cfg = _tiny_e2e_cfg(tiny_cfg, attribute_loss_weight=0.2, scst_xe_mix=0.1)
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    state = create_train_state(cfg, params)
    tables = tables_from_dataset(tiny_dataset)
    step = make_scst_step(model, cfg, tables=tables)
    batch = _pixel_batch(cfg, tiny_dataset)
    new_state, m = step(state, batch)
    for k in ("loss", "attr_loss", "xe_anchor", "reward_sample", "grad_norm"):
        assert np.isfinite(float(m[k])), (k, m[k])
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["backbone"], new_state.params["backbone"])
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_e2e_scst_multitask_preset_shape():
    """The flagship preset exists and composes every ingredient of the
    reference's stage 3 (BASELINE north_star 'multitask XE+RL loss')."""
    from vidcap_tpu.config import get_preset
    cfg = get_preset("e2e_scst_multitask")
    assert cfg.train.stage == "scst"
    assert cfg.model.use_backbone
    assert cfg.train.attribute_loss_weight > 0
    assert cfg.train.scst_xe_mix > 0
    assert cfg.train.scst_learning_rate is not None
    assert cfg.train.scst_learning_rate < cfg.train.learning_rate


def test_composed_preset_trains_on_pixels(tiny_cfg, tiny_backbone, tmp_path):
    """train() end-to-end on the composed configuration over a PIXELS corpus:
    the loop builds the reward tables, routes stage='scst' through the shared-
    encode body, and steps without shape surgery (CLI path: _load_dataset
    produces a pixels fixture for use_backbone presets)."""
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.train.loop import train

    cfg = _tiny_e2e_cfg(tiny_cfg, attribute_loss_weight=0.2, scst_xe_mix=0.1,
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        num_steps=2, checkpoint_every=2, log_every=1)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, eval_every=0))
    dataset = CaptionDataset.synthetic(cfg.data, num_videos=8, pixels=True)
    assert dataset.features.ndim == 5
    state = train(cfg, dataset=dataset, num_steps=2)
    assert int(state.step) == 2


@pytest.mark.slow
def test_composed_step_sharded_matches_single_device(tiny_cfg, tiny_dataset,
                                                     tiny_backbone):
    """The COMPOSED flagship step (pixels → shared encode → PG + attr + XE
    anchor) under `make_sharded_step` on the 8-way DP mesh computes the SAME
    loss as the single-device step: the namesake configuration is covered on
    the multi-chip path in CI, not only in the driver dryrun artifact."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from vidcap_tpu.parallel.mesh import make_mesh
    from vidcap_tpu.parallel.sharding import (make_sharded_step, place_state,
                                              shard_batch)

    cfg = _tiny_e2e_cfg(tiny_cfg, attribute_loss_weight=0.2, scst_xe_mix=0.1)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=8))
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    tables = tables_from_dataset(tiny_dataset)
    batch = _pixel_batch(cfg, tiny_dataset, B=8)

    step1 = make_scst_step(model, cfg, tables=tables)
    _, m1 = step1(create_train_state(cfg, params), batch)

    mesh = make_mesh(cfg.mesh, num_data=8, num_model=1)
    with mesh:
        state8 = place_state(create_train_state(cfg, params), mesh)
        step8 = make_sharded_step(
            cfg, mesh, make_scst_step_body(model, cfg, tables=tables))
        _, m8 = step8(state8, shard_batch(batch, mesh))

    for k in ("loss", "attr_loss", "xe_anchor", "reward_sample"):
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=1e-4,
                                   err_msg=k)


def test_pixel_mode_caption_dataset(tiny_cfg, tiny_backbone):
    """Periodic-eval path for e2e presets: Captioner.caption_dataset decodes
    a PIXELS corpus ([N, T, S, S, 3] -> backbone encode inside the decode
    graph). Guards the train-time maybe_eval route the composed staged demo
    drives (the pixel TRAIN path alone doesn't cover it)."""
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.inference import Captioner

    cfg = _tiny_e2e_cfg(tiny_cfg)
    dataset = CaptionDataset.synthetic(cfg.data, num_videos=6, pixels=True)
    cap = Captioner.from_checkpoint(cfg, dataset, checkpoint_dir=None)
    out = cap.caption_dataset(method="greedy", batch_size=4)
    assert set(out) == set(dataset.video_ids)
    assert all(isinstance(v[0], str) for v in out.values())
