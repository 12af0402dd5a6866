"""SCST with the fused Pallas rollout path (kernel rollouts + XLA re-score):
gradients flow and the step runs end-to-end (interpret mode on CPU)."""
import dataclasses

import jax
import numpy as np

from vidcap_tpu.models.model import create_model, init_params
from vidcap_tpu.objectives.reward_tables import tables_from_dataset
from vidcap_tpu.train.loop import batch_to_device_dict
from vidcap_tpu.train.scst import make_scst_step
from vidcap_tpu.train.state import create_train_state


def test_scst_pallas_step_runs(tiny_cfg, tiny_dataset):
    cfg = dataclasses.replace(
        tiny_cfg,
        model=dataclasses.replace(tiny_cfg.model, use_pallas_decoder=True),
        train=dataclasses.replace(tiny_cfg.train, stage="scst", batch_size=8,
                                  donate_state=False))
    model = create_model(cfg, vocab_size=tiny_dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    state = create_train_state(cfg, params)
    tables = tables_from_dataset(tiny_dataset)
    step = make_scst_step(model, cfg, tables=tables)

    it = tiny_dataset.batches(8, seed=0)
    old = jax.tree_util.tree_leaves(state.params)
    for _ in range(3):
        state, m = step(state, batch_to_device_dict(next(it)))
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["reward_sample"]))
    assert float(m["grad_norm"]) >= 0
    new = jax.tree_util.tree_leaves(state.params)
    assert any(float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
               for a, b in zip(old, new))
