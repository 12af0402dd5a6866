"""Multi-step dispatch (cfg.train.steps_per_dispatch, bank mode): K steps per
jitted lax.scan call must consume the SAME batch stream and produce
bit-identical params to K single-step dispatches, with checkpoints/resume and
per-step logging preserved (PARITY §6 at-scale wall row; ARCHITECTURE §3)."""
import dataclasses

import jax
import numpy as np
import pytest

from vidcap_tpu.train.loop import train
from vidcap_tpu.utils.logging import MetricsLogger


def _cfg(tiny_cfg, tmp_path, steps, name, k=1, stage=None, **kw):
    tr = dataclasses.replace(
        tiny_cfg.train, num_steps=steps, checkpoint_every=100, log_every=100,
        device_feature_bank=True, steps_per_dispatch=k,
        checkpoint_dir=str(tmp_path / name), **kw)
    if stage:
        tr = dataclasses.replace(tr, stage=stage)
    return dataclasses.replace(tiny_cfg, train=tr)


def _assert_params_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_multistep_xe_bit_exact_with_tail(tmp_path, tiny_cfg, tiny_dataset):
    """10 steps with K=4 (2 chunks + 2-step tail) == 10 steps with K=1."""
    logger = MetricsLogger(quiet=True)
    s1 = train(_cfg(tiny_cfg, tmp_path, 10, "k1", k=1),
               dataset=tiny_dataset, logger=logger)
    s4 = train(_cfg(tiny_cfg, tmp_path, 10, "k4", k=4),
               dataset=tiny_dataset, logger=logger)
    assert int(s1.step) == int(s4.step) == 10
    _assert_params_equal(s1, s4)


def test_multistep_scst_bit_exact(tmp_path, tiny_cfg, tiny_dataset):
    logger = MetricsLogger(quiet=True)
    kw = dict(stage="scst", batch_size=8)
    s1 = train(_cfg(tiny_cfg, tmp_path, 4, "s1", k=1, **kw),
               dataset=tiny_dataset, logger=logger)
    s2 = train(_cfg(tiny_cfg, tmp_path, 4, "s2", k=2, **kw),
               dataset=tiny_dataset, logger=logger)
    _assert_params_equal(s1, s2)


def test_multistep_resume_parity_even_across_k_change(tmp_path, tiny_cfg,
                                                      tiny_dataset):
    """Interrupt a K=4 run at its chunk-boundary checkpoint, resume with a
    DIFFERENT K — the stream replays from the saved iterator state, so the
    final params still match an uninterrupted run."""
    logger = MetricsLogger(quiet=True)

    def cfg(steps, name, k):
        c = _cfg(tiny_cfg, tmp_path, steps, name, k=k)
        return dataclasses.replace(
            c, train=dataclasses.replace(c.train, checkpoint_every=4))

    ref = train(cfg(12, "a", 4), dataset=tiny_dataset, logger=logger)
    train(cfg(4, "b", 4), dataset=tiny_dataset, logger=logger)
    res = train(cfg(12, "b", 2), dataset=tiny_dataset, logger=logger,
                resume=True)
    assert int(ref.step) == int(res.step) == 12
    _assert_params_equal(ref, res)


def test_multistep_logs_every_step(tmp_path, tiny_cfg, tiny_dataset):
    """Per-step log granularity survives chunking: log_every=1 under K=3
    emits one row per step with that step's own loss."""
    rows = []

    class _L(MetricsLogger):
        def __init__(self):
            super().__init__(quiet=True)

        def log(self, step, metrics):
            rows.append((step, dict(metrics)))

    c = _cfg(tiny_cfg, tmp_path, 6, "log", k=3)
    c = dataclasses.replace(
        c, train=dataclasses.replace(c.train, log_every=1))
    train(c, dataset=tiny_dataset, logger=_L())
    train_rows = [(s, m) for s, m in rows if "loss" in m]
    assert [s for s, _ in train_rows] == [1, 2, 3, 4, 5, 6]
    losses = [m["loss"] for _, m in train_rows]
    assert len(set(losses)) > 1   # real per-step values, not one broadcast


def test_multistep_requires_feature_mode(tiny_cfg):
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.train.steps import make_banked_multistep
    ds = CaptionDataset.synthetic(tiny_cfg.data, num_videos=4, seed=0,
                                  pixels=True)
    with pytest.raises(ValueError, match="feature-mode"):
        make_banked_multistep(tiny_cfg, lambda s, b: (s, {}), ds, 4)
