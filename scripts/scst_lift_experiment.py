"""SCST quality-lift experiment (VERDICT r2 #3).

The framework's differentiator — the fully on-device SCST loop — must be shown
to IMPROVE a held-out metric, not merely run. The round-2 staged-pipeline row
started from an XE-saturated toy fit (CIDEr 6.57 -> 5.97), which can only go
down. This experiment deliberately UNDER-trains XE (few steps => entropic
policy) and then lets SCST optimize CIDEr directly against the greedy
baseline, measuring val CIDEr on HELD-OUT videos at each phase.

    PYTHONPATH= python scripts/scst_lift_experiment.py [xe_steps] [scst_steps]

Prints a json line {"xe": ..., "scst": ..., "lift": ...}; the frozen
(seeded) configuration backing tests/test_scst_lift.py.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax


def build(xe_steps=40, scst_steps=300, seed=0, cpu=True):
    """Run XE(xe_steps) -> eval -> SCST(scst_steps) -> eval. Returns
    (cider_after_xe, cider_after_scst)."""
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from vidcap_tpu.config import get_preset
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.inference import Captioner
    from vidcap_tpu.metrics.evaluate import evaluate_captions
    from vidcap_tpu.models.model import create_model, init_params
    from vidcap_tpu.train.loop import batch_to_device_dict
    from vidcap_tpu.train.scst import make_scst_step
    from vidcap_tpu.train.state import create_train_state
    from vidcap_tpu.train.steps import make_xe_step

    base = get_preset("synthetic_tiny")
    cfg = dataclasses.replace(
        base, train=dataclasses.replace(
            base.train, batch_size=16, seed=seed,
            # SCST hygiene: small PG LR, XE anchor keeps fluency
            scst_learning_rate=3e-4, scst_xe_mix=0.05))

    train_ds = CaptionDataset.synthetic(cfg.data, num_videos=128, seed=seed)
    # held-out videos, same generative process, same vocab
    val_ds = CaptionDataset(
        **_val_corpus(cfg, seed + 1000), cfg=cfg.data, vocab=train_ds.vocab)

    model = create_model(cfg, vocab_size=train_ds.vocab.size)
    params = init_params(model, cfg, jax.random.key(seed))
    state = create_train_state(cfg, params)
    xe_step = make_xe_step(model, cfg)
    it = train_ds.batches(cfg.train.batch_size, seed=seed)
    for _ in range(xe_steps):
        state, m = xe_step(state, batch_to_device_dict(next(it)))

    def val_cider(st):
        cap = Captioner.from_state(cfg, val_ds, st)
        results = cap.caption_dataset(method="greedy",
                                      batch_size=cfg.train.batch_size)
        refs = {v: val_ds.video_captions[v] for v in results}
        return evaluate_captions(refs, results)["CIDEr"]

    cider_xe = val_cider(state)

    scst_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, stage="scst"))
    scst_state = create_train_state(scst_cfg, state.params, seed=seed)
    scst_step = make_scst_step(model, scst_cfg, train_ds)
    for _ in range(scst_steps):
        scst_state, sm = scst_step(scst_state,
                                   batch_to_device_dict(next(it)))

    cider_scst = val_cider(scst_state)
    return float(cider_xe), float(cider_scst), float(sm["reward_sample"])


def _val_corpus(cfg, seed):
    from vidcap_tpu.data.synthetic import make_synthetic_corpus
    corpus = make_synthetic_corpus(
        num_videos=64, num_frames=cfg.data.num_frames,
        feature_dim=cfg.data.feature_dim, seed=seed)
    return dict(features=corpus["features"], video_ids=corpus["video_ids"],
                video_captions=corpus["captions"])


if __name__ == "__main__":
    xe_n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    scst_n = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    xe, scst, rwd = build(xe_n, scst_n)
    print(json.dumps({"xe_steps": xe_n, "scst_steps": scst_n,
                      "val_cider_xe": round(xe, 4),
                      "val_cider_scst": round(scst, 4),
                      "lift": round(scst - xe, 4),
                      "final_reward_sample": round(rwd, 4)}))
