"""Checkpoint / resume via orbax (SURVEY.md §5 "Checkpoint / resume").

Replaces the reference's ``tf.train.Saver`` with async orbax saves of the full train
state (params, optimizer state, step, RNG key) and auto-resume-from-latest.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from vidcap_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True),
        )

    def save(self, state: TrainState) -> None:
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step, "rng": jax.random.key_data(state.rng)}
        self._mgr.save(int(state.step), args=ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None
                ) -> TrainState:
        """Restore into the structure of `state` (must be built with the same
        config); returns the restored TrainState."""
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step,
                  "rng": jax.random.key_data(state.rng)}
        step = step if step is not None else self._mgr.latest_step()
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target))
        return state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=restored["step"],
            rng=jax.random.wrap_key_data(restored["rng"]))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
