"""Training orchestration (SURVEY.md L6, C17): staged XE → SCST → e2e loops.

The python loop only moves batches and logs — every numerical step is one jitted call.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from vidcap_tpu.config import Config
from vidcap_tpu.data.loader import Batch, CaptionDataset
from vidcap_tpu.models.model import create_model, init_params
from vidcap_tpu.train.checkpoint import CheckpointManager
from vidcap_tpu.train.state import TrainState, create_train_state
from vidcap_tpu.train.steps import make_xe_step
from vidcap_tpu.utils.logging import MetricsLogger


def batch_to_device_dict(batch: Batch) -> Dict[str, np.ndarray]:
    return {
        "features": batch.features,
        "tokens": batch.tokens,
        "mask": batch.mask,
        "attributes": batch.attributes,
        "video_idx": batch.video_idx,
    }


def train(
    cfg: Config,
    dataset: Optional[CaptionDataset] = None,
    num_steps: Optional[int] = None,
    logger: Optional[MetricsLogger] = None,
    resume: bool = False,
    make_step: Optional[Callable] = None,
) -> TrainState:
    """Run one training stage; returns the final TrainState."""
    dataset = dataset or CaptionDataset.synthetic(cfg.data)
    logger = logger or MetricsLogger()
    num_steps = num_steps or cfg.train.num_steps

    model = create_model(cfg, vocab_size=dataset.vocab.size)
    params = init_params(model, cfg, jax.random.key(cfg.train.seed))
    state = create_train_state(cfg, params)

    from vidcap_tpu.data.pipeline import DeterministicBatcher

    ckpt = CheckpointManager(cfg.train.checkpoint_dir)
    iter_state = None
    if resume and ckpt.latest_step() is not None:
        state, iter_state = ckpt.restore(state, with_iter=True)

    if make_step is None:
        if cfg.train.stage in ("xe", "e2e"):
            step_fn = make_xe_step(model, cfg)
        elif cfg.train.stage == "scst":
            from vidcap_tpu.train.scst import make_scst_step
            step_fn = make_scst_step(model, cfg, dataset)
        else:
            raise ValueError(f"unknown stage {cfg.train.stage!r}")
    else:
        step_fn = make_step(model, cfg)

    start = int(state.step)
    # deterministic, checkpointable batch stream: a resumed run replays the
    # exact remaining stream (SIGKILL-resume parity, SURVEY.md §5)
    it = DeterministicBatcher(dataset, cfg.train.batch_size,
                              state=iter_state, seed=cfg.train.seed)
    t_last, s_last = time.time(), start
    for i in range(start, num_steps):
        batch = next(it)
        state, metrics = step_fn(state, batch_to_device_dict(batch))
        if (i + 1) % cfg.train.log_every == 0 or i + 1 == num_steps:
            now = time.time()
            sps = (i + 1 - s_last) / max(now - t_last, 1e-9)
            t_last, s_last = now, i + 1
            metrics = dict(metrics)
            metrics["steps_per_sec"] = sps
            logger.log(i + 1, metrics)
        if (i + 1) % cfg.train.checkpoint_every == 0 or i + 1 == num_steps:
            ckpt.save(state, iter_state=it.state)
    ckpt.wait()
    ckpt.close()
    return state
