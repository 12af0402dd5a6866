"""Device-resident feature bank (cfg.train.device_feature_bank): the jitted
step gathers features/attributes from an HBM-resident bank by video_idx
instead of receiving them with each batch. Must be BIT-EXACT vs the
host-transfer path — the gather reads the same f32 rows the loader would
have sliced on the host (SURVEY.md §3 input pipeline; PARITY §6 at-scale
wall-clock is transfer-dominated, this removes ~99.7% of the per-step
payload at production dims)."""
import dataclasses

import jax
import jax.numpy as jnp
import pytest

from vidcap_tpu.models.model import create_model, init_params
from vidcap_tpu.train.loop import batch_to_device_dict
from vidcap_tpu.train.scst import make_scst_step, make_scst_step_body
from vidcap_tpu.train.state import create_train_state
from vidcap_tpu.train.steps import (make_banked_step, make_xe_step,
                                    make_xe_step_body)


def _max_tree_delta(a, b):
    return max(float(jnp.max(jnp.abs(x - y))) for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def test_banked_xe_step_bit_exact(tiny_cfg, tiny_dataset):
    cfg = tiny_cfg
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    # two independent param trees (same key => identical values, separate
    # buffers — donate_state would otherwise delete the shared arrays)
    state_a = create_train_state(cfg, init_params(model, cfg, jax.random.key(0)))
    state_b = create_train_state(cfg, init_params(model, cfg, jax.random.key(0)))

    plain = make_xe_step(model, cfg)
    banked, banks = make_banked_step(
        cfg, make_xe_step_body(model, cfg), tiny_dataset)
    assert banks["features"].shape == tiny_dataset.features.shape

    it = tiny_dataset.batches(8, seed=3)
    for _ in range(3):
        b = next(it)
        state_a, m_a = plain(state_a, batch_to_device_dict(b))
        state_b, m_b = banked(state_b, batch_to_device_dict(b, bank_mode=True))
        assert float(m_a["loss"]) == float(m_b["loss"])
    assert _max_tree_delta(state_a.params, state_b.params) == 0.0


def test_banked_batch_dict_omits_features(tiny_dataset):
    b = next(tiny_dataset.batches(4, seed=0))
    full = batch_to_device_dict(b)
    lean = batch_to_device_dict(b, bank_mode=True)
    assert "features" in full and "attributes" in full
    assert "features" not in lean and "attributes" not in lean
    assert "video_idx" in lean and "tokens" in lean and "mask" in lean


def test_banked_scst_step_bit_exact(tiny_cfg, tiny_dataset):
    cfg = dataclasses.replace(
        tiny_cfg, train=dataclasses.replace(
            tiny_cfg.train, stage="scst", batch_size=8))
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    state_a = create_train_state(cfg, init_params(model, cfg, jax.random.key(1)))
    state_b = create_train_state(cfg, init_params(model, cfg, jax.random.key(1)))

    plain = make_scst_step(model, cfg, tiny_dataset)
    banked, _ = make_banked_step(
        cfg, make_scst_step_body(model, cfg, tiny_dataset), tiny_dataset)

    it = tiny_dataset.batches(8, seed=5)
    for _ in range(2):
        b = next(it)
        state_a, m_a = plain(state_a, batch_to_device_dict(b))
        state_b, m_b = banked(state_b, batch_to_device_dict(b, bank_mode=True))
        assert float(m_a["loss"]) == float(m_b["loss"])
        assert float(m_a["reward_sample"]) == float(m_b["reward_sample"])
    assert _max_tree_delta(state_a.params, state_b.params) == 0.0


def test_banked_interrupted_resume_exact_parity(tmp_path, tiny_cfg,
                                                tiny_dataset):
    """Bank mode must preserve the SIGKILL-exact resume property: interrupt
    at a checkpoint, resume, and land on bit-identical params vs an
    uninterrupted banked run (mirrors test_fault_recovery)."""
    import numpy as np
    from vidcap_tpu.train.loop import train
    from vidcap_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(quiet=True)

    def _cfg(steps, name):
        return dataclasses.replace(
            tiny_cfg, train=dataclasses.replace(
                tiny_cfg.train, num_steps=steps, checkpoint_every=5,
                log_every=100, device_feature_bank=True,
                checkpoint_dir=str(tmp_path / name)))

    state_a = train(_cfg(10, "a"), dataset=tiny_dataset, logger=logger)
    train(_cfg(5, "b"), dataset=tiny_dataset, logger=logger)
    state_b = train(_cfg(10, "b"), dataset=tiny_dataset, logger=logger,
                    resume=True)
    assert int(state_a.step) == int(state_b.step) == 10
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_caption_dataset_device_bank_identical(tiny_cfg, tiny_dataset):
    """Decode-side bank (Captioner.caption_dataset(device_bank=True)) must
    produce the identical captions as the host-transfer path."""
    from vidcap_tpu.inference import Captioner
    from vidcap_tpu.models.model import create_model, init_params

    model = create_model(tiny_cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, tiny_cfg, jax.random.key(2))

    class _S:
        pass

    s = _S()
    s.params = params
    cap = Captioner.from_state(tiny_cfg, tiny_dataset, s)
    plain = cap.caption_dataset(method="greedy", batch_size=8)
    banked = cap.caption_dataset(method="greedy", batch_size=8,
                                 device_bank=True)
    assert plain == banked
    assert cap._feature_bank is not None   # cached across calls


def test_banked_rejects_pixel_mode(tiny_cfg):
    from vidcap_tpu.data.loader import CaptionDataset
    ds = CaptionDataset.synthetic(tiny_cfg.data, num_videos=4, seed=0,
                                  pixels=True)
    with pytest.raises(ValueError, match="feature-mode"):
        make_banked_step(tiny_cfg, lambda s, b: (s, {}), ds)


def test_sharded_banked_step_matches_sharded(tiny_cfg, tiny_dataset):
    """--feature-bank composes with --sharded: replicated HBM banks +
    data-sharded token batches produce the SAME loss/params as the
    non-banked sharded step (same rows, same order) on the 8-device mesh."""
    from vidcap_tpu.parallel.mesh import make_mesh
    from vidcap_tpu.parallel.sharding import (make_sharded_banked_step,
                                              make_sharded_step, place_state,
                                              shard_batch)

    cfg = tiny_cfg
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    mesh = make_mesh(cfg.mesh, num_data=8, num_model=1)
    with mesh:
        state_a = place_state(create_train_state(
            cfg, init_params(model, cfg, jax.random.key(0))), mesh)
        state_b = place_state(create_train_state(
            cfg, init_params(model, cfg, jax.random.key(0))), mesh)
        plain = make_sharded_step(cfg, mesh,
                                  make_xe_step_body(model, cfg))
        banked, banks = make_sharded_banked_step(
            cfg, mesh, make_xe_step_body(model, cfg), tiny_dataset)
        assert banks["features"].shape == tiny_dataset.features.shape

        it = tiny_dataset.batches(16, seed=5)
        for _ in range(2):
            b = next(it)
            state_a, m_a = plain(
                state_a, shard_batch(batch_to_device_dict(b), mesh))
            state_b, m_b = banked(
                state_b,
                shard_batch(batch_to_device_dict(b, bank_mode=True), mesh))
            assert float(m_a["loss"]) == float(m_b["loss"])
    assert _max_tree_delta(state_a.params, state_b.params) == 0.0


def test_sharded_banked_scst_step_matches_sharded(tiny_cfg, tiny_dataset):
    from vidcap_tpu.parallel.mesh import make_mesh
    from vidcap_tpu.parallel.sharding import (make_sharded_banked_step,
                                              make_sharded_step, place_state,
                                              shard_batch)

    cfg = dataclasses.replace(
        tiny_cfg, train=dataclasses.replace(tiny_cfg.train, stage="scst",
                                            donate_state=False))
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    mesh = make_mesh(cfg.mesh, num_data=8, num_model=1)
    with mesh:
        state = place_state(create_train_state(
            cfg, init_params(model, cfg, jax.random.key(0))), mesh)
        plain = make_sharded_step(
            cfg, mesh, make_scst_step_body(model, cfg, tiny_dataset))
        banked, _ = make_sharded_banked_step(
            cfg, mesh, make_scst_step_body(model, cfg, tiny_dataset),
            tiny_dataset)
        b = next(tiny_dataset.batches(16, seed=7))
        _, m_a = plain(state, shard_batch(batch_to_device_dict(b), mesh))
        _, m_b = banked(
            state, shard_batch(batch_to_device_dict(b, bank_mode=True),
                               mesh))
        assert float(m_a["loss"]) == float(m_b["loss"])
