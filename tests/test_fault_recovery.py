"""Fault injection / resume parity (SURVEY.md §5 "Failure detection"):
a run interrupted at a checkpoint and resumed must produce EXACTLY the same
final parameters as an uninterrupted run (same batch stream, same RNG path)."""
import dataclasses

import jax
import numpy as np

from vidcap_tpu.train.loop import train
from vidcap_tpu.utils.logging import MetricsLogger


def _cfg(tiny_cfg, tmp_path, steps, name):
    return dataclasses.replace(
        tiny_cfg,
        train=dataclasses.replace(tiny_cfg.train, num_steps=steps,
                                  checkpoint_every=5, log_every=100,
                                  checkpoint_dir=str(tmp_path / name)))


def test_interrupted_resume_exact_parity(tmp_path, tiny_cfg, tiny_dataset):
    logger = MetricsLogger(quiet=True)

    # uninterrupted 10-step run
    cfg_a = _cfg(tiny_cfg, tmp_path, 10, "a")
    state_a = train(cfg_a, dataset=tiny_dataset, logger=logger)

    # "crash" after step 5 (checkpoint exists), then resume to 10
    cfg_b5 = _cfg(tiny_cfg, tmp_path, 5, "b")
    train(cfg_b5, dataset=tiny_dataset, logger=logger)
    cfg_b10 = _cfg(tiny_cfg, tmp_path, 10, "b")
    state_b = train(cfg_b10, dataset=tiny_dataset, logger=logger, resume=True)

    assert int(state_a.step) == int(state_b.step) == 10
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_interrupted_resume_parity_with_prefetch(tmp_path, tiny_cfg,
                                                 tiny_dataset):
    """Same interrupted-resume EXACT parity, with host-side prefetch enabled —
    the checkpointed iterator state must cover only consumed batches."""
    logger = MetricsLogger(quiet=True)

    def _pcfg(steps, name):
        cfg = _cfg(tiny_cfg, tmp_path, steps, name)
        return dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, prefetch_depth=3))

    state_a = train(_pcfg(10, "pa"), dataset=tiny_dataset, logger=logger)
    train(_pcfg(5, "pb"), dataset=tiny_dataset, logger=logger)
    state_b = train(_pcfg(10, "pb"), dataset=tiny_dataset, logger=logger,
                    resume=True)

    assert int(state_a.step) == int(state_b.step) == 10
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
