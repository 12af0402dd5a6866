"""SCST integration (SURVEY.md §4.4): one fused step runs with finite advantage and
nonzero grads; greedy CIDEr improves when SCST follows XE pretraining."""
import dataclasses

import jax
import numpy as np

from vidcap_tpu.metrics.cider import CiderScorer
from vidcap_tpu.models.model import create_model, init_params
from vidcap_tpu.objectives.reward_tables import tables_from_dataset
from vidcap_tpu.train.loop import batch_to_device_dict
from vidcap_tpu.train.scst import make_scst_step
from vidcap_tpu.train.state import create_train_state
from vidcap_tpu.train.steps import make_xe_step


def _greedy_cider(cfg, dataset, params):
    from vidcap_tpu.inference import Captioner
    from vidcap_tpu.data.vocab import ptb_tokenize

    class _S:  # minimal state shim
        pass

    s = _S()
    s.params = params
    cap = Captioner.from_state(cfg, dataset, s)
    res = cap.caption_dataset(method="greedy", batch_size=16)
    gts = {v: [ptb_tokenize(c) for c in caps]
           for v, caps in dataset.video_captions.items()}
    scorer = CiderScorer(gts)
    scores = [scorer.score(v, ptb_tokenize(caps[0]))
              for v, caps in res.items()]
    return float(np.mean(scores))


def test_scst_step_runs_and_improves(tiny_cfg, tiny_dataset):
    cfg = dataclasses.replace(
        tiny_cfg,
        train=dataclasses.replace(tiny_cfg.train, stage="scst",
                                  learning_rate=3e-3,
                                  scst_learning_rate=1e-3, batch_size=8))
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))

    # XE pretrain so rollouts aren't pure noise — its OWN optimizer state at
    # the XE rate (the optimizer LR lives in state.tx, not in the step's cfg)
    xe_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, stage="xe"))
    xe_state = create_train_state(xe_cfg, params)
    xe = make_xe_step(model, xe_cfg)
    it = tiny_dataset.batches(8, seed=0)
    for _ in range(40):
        xe_state, _ = xe(xe_state, batch_to_device_dict(next(it)))
    state = create_train_state(cfg, xe_state.params)

    cider_before = _greedy_cider(cfg, tiny_dataset, state.params)

    tables = tables_from_dataset(tiny_dataset)
    scst = make_scst_step(model, cfg, tables=tables)
    adv_stds, grad_norms = [], []
    for _ in range(60):
        state, m = scst(state, batch_to_device_dict(next(it)))
        adv_stds.append(float(m["advantage_std"]))
        grad_norms.append(float(m["grad_norm"]))
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["reward_sample"]))

    assert max(adv_stds) > 0.0          # sampling explores
    assert max(grad_norms) > 0.0        # gradients flow

    cider_after = _greedy_cider(cfg, tiny_dataset, state.params)
    # SCST directly optimizes CIDEr; on the toy corpus it must not regress
    # and should typically improve
    assert cider_after > cider_before - 0.05, (cider_before, cider_after)


def test_scst_reward_greedy_equals_eval_cider(tiny_cfg, tiny_dataset):
    """The on-device reward of the greedy rollout must equal the host CIDEr of the
    decoded strings — ties the reward path to the eval path end-to-end."""
    from vidcap_tpu.data.vocab import ptb_tokenize
    from vidcap_tpu.models.decoding import greedy_decode
    from vidcap_tpu.models.model import VidCapModel
    from vidcap_tpu.objectives.reward import cider_reward
    import jax.numpy as jnp

    cfg = tiny_cfg
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(2))
    tables = tables_from_dataset(tiny_dataset)

    batch = next(tiny_dataset.video_batches(8))

    def step_fn(state, tok):
        return model.apply({"params": params}, state, tok,
                           method=VidCapModel.step)

    state = model.apply({"params": params}, jnp.asarray(batch.features),
                        method=VidCapModel.init_state)
    roll = greedy_decode(step_fn, state, 8, cfg.decode.max_len)
    dev = np.asarray(cider_reward(tables, jnp.asarray(batch.video_idx),
                                  roll.tokens, roll.mask))

    # host oracle on the SAME integer ids (strip eos/pad like the tables do)
    refs = {}
    for v_i, vid in enumerate(tiny_dataset.video_ids):
        rows = tiny_dataset.tokens[tiny_dataset.caption_video_idx == v_i]
        refs[v_i] = [[int(t) for t in row if t >= 3] for row in rows]
    scorer = CiderScorer(refs)
    toks = np.asarray(roll.tokens)
    for b in range(8):
        cand = []
        for t in toks[b]:
            if t == 2:
                break
            if t >= 3:
                cand.append(int(t))
        host = scorer.score(int(batch.video_idx[b]), cand)
        np.testing.assert_allclose(dev[b], host, rtol=1e-4, atol=1e-5)


def test_e2e_scst_step_through_backbone(tiny_cfg, tiny_dataset, monkeypatch):
    """VERDICT r1 next #10 (SURVEY §3.5 × §3.2): ONE SCST step through the
    full e2e stack — pixels → tiny IRv2 → sampling+greedy rollouts → on-device
    CIDEr reward → PG gradients flowing INTO the CNN. Finite loss/grads, and
    the backbone params actually move."""
    import jax.numpy as jnp
    from vidcap_tpu.models import backbone as bb_mod

    orig = bb_mod.InceptionResNetV2
    monkeypatch.setattr(
        bb_mod, "InceptionResNetV2",
        lambda **kw: orig(width_mult=0.0625, depth=(1, 1, 1), **kw))

    cfg = dataclasses.replace(
        tiny_cfg,
        data=dataclasses.replace(tiny_cfg.data, num_frames=2, frame_size=149,
                                 feature_dim=96),   # 1536 * 0.0625
        model=dataclasses.replace(tiny_cfg.model, use_backbone=True,
                                  use_pallas_decoder=False),
        train=dataclasses.replace(tiny_cfg.train, stage="scst",
                                  scst_learning_rate=1e-4, batch_size=2,
                                  donate_state=False))

    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    state = create_train_state(cfg, params)

    tables = tables_from_dataset(tiny_dataset)
    scst = make_scst_step(model, cfg, tables=tables)

    B, T = 2, 2
    rng = np.random.default_rng(0)
    batch = {
        "features": jnp.asarray(rng.normal(size=(B, T, 149, 149, 3)),
                                jnp.float32),
        "tokens": jnp.zeros((B, cfg.data.max_caption_len), jnp.int32),
        "mask": jnp.ones((B, cfg.data.max_caption_len), jnp.float32),
        "attributes": jnp.zeros((B, cfg.data.num_attributes), jnp.float32),
        "video_idx": jnp.asarray(rng.integers(0, tiny_dataset.num_videos,
                                              size=(B,)), jnp.int32),
    }
    new_state, m = scst(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["reward_sample"]))
    assert np.isfinite(float(m["grad_norm"]))
    # PG gradients reach the CNN: backbone params moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["backbone"], new_state.params["backbone"])
    assert max(jax.tree_util.tree_leaves(diff)) > 0
