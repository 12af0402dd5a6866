"""Checkpoint / resume via orbax (SURVEY.md §5 "Checkpoint / resume").

Replaces the reference's ``tf.train.Saver`` with async orbax saves of the full train
state (params, optimizer state, step, RNG key) and auto-resume-from-latest.
"""
from __future__ import annotations

import json
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

    def save(self, state: TrainState, iter_state=None,
             stage: Optional[str] = None) -> None:
        """iter_state: optional data/pipeline.IteratorState — saved alongside so
        a resumed run replays the exact remaining batch stream (SIGKILL-resume
        parity, SURVEY.md §5 failure recovery). The iter_state slot is ALWAYS
        written (sentinel [-1,-1,-1] when absent) so the checkpoint layout is
        explicit rather than probed by exception type (ADVICE r1).

        stage: the training stage ("xe"/"scst"/"e2e") that produced this
        state, recorded in a sidecar so a resume can detect a stage CHANGE and
        refuse to carry the previous objective's optimizer moments even when
        the opt_state structures happen to match (ADVICE r2)."""
        import numpy as np
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step, "rng": jax.random.key_data(state.rng)}
        if iter_state is not None:
            payload["iter_state"] = np.asarray(
                [iter_state.seed, iter_state.epoch, iter_state.position],
                np.int64)
        else:
            payload["iter_state"] = np.asarray([-1, -1, -1], np.int64)
        self._mgr.save(int(state.step), args=ocp.args.StandardSave(payload))
        if stage is not None:
            self._record_stage(int(state.step), stage)

    # ------------------------------------------------------------ stage sidecar

    def _stage_path(self) -> str:
        return os.path.join(self.directory, "stage.json")

    def _record_stage(self, step: int, stage: str) -> None:
        try:
            with open(self._stage_path()) as f:
                rec = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            rec = {}
        rec[str(step)] = stage
        # prune entries for steps orbax garbage-collected (max_to_keep) so the
        # sidecar tracks the retained checkpoints, and write atomically: a
        # crash mid-write must not corrupt the file and silently downgrade
        # future resumes to the legacy heuristic (ADVICE r3 checkpoint.py:58)
        kept = {str(s) for s in self._mgr.all_steps()} | {str(step)}
        rec = {k: v for k, v in rec.items() if k in kept}
        tmp = self._stage_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._stage_path())

    def saved_stage(self, step: Optional[int] = None) -> Optional[str]:
        """Stage recorded for ``step`` (default: latest), or None for
        checkpoints written before stage recording existed."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        try:
            with open(self._stage_path()) as f:
                return json.load(f).get(str(step))
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None,
                with_iter: bool = False):
        """Restore into the structure of `state` (must be built with the same
        config). Returns the TrainState, or (TrainState, IteratorState|None)
        when with_iter=True."""
        import numpy as np
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step,
                  "rng": jax.random.key_data(state.rng)}
        step = step if step is not None else self._mgr.latest_step()
        # current layout always carries an iter_state slot (sentinel -1s when
        # none); legacy checkpoints may omit it — fall back on ANY structure
        # error, not just ValueError (orbax versions differ, ADVICE r1)
        has_iter = True
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(
                    dict(target, iter_state=np.zeros((3,), np.int64))))
        except (ValueError, KeyError, TypeError):
            has_iter = False
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(target))
        new_state = state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=restored["step"],
            rng=jax.random.wrap_key_data(restored["rng"]))
        if not with_iter:
            return new_state
        iter_state = None
        if has_iter and int(restored["iter_state"][0]) >= 0:
            from vidcap_tpu.data.pipeline import IteratorState
            s, e, p = [int(x) for x in restored["iter_state"]]
            iter_state = IteratorState(seed=s, epoch=e, position=p)
        return new_state, iter_state

    def restore_params_only(self, state: TrainState,
                            step: Optional[int] = None,
                            with_iter: bool = False):
        """Cross-stage restore: params/step/rng come from the checkpoint, the
        optimizer state is re-initialised fresh from ``state.tx``.

        Needed when the optimizer STRUCTURE changed between stages (e.g. the
        xe adam chain → the e2e multi_transform chain): restoring the old
        opt_state into the new template is a structural error, and carrying
        XE's adam moments into a different objective would be wrong anyway.

        The restored params tree is verified against the model template so a
        genuinely corrupt/mismatched checkpoint surfaces here instead of
        producing a broken TrainState (ADVICE r2)."""
        step = step if step is not None else self._mgr.latest_step()
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore())
        self._verify_params_tree(state.params, restored.get("params"))
        new_state = state.replace(
            params=restored["params"],
            opt_state=state.tx.init(restored["params"]),
            step=restored["step"],
            rng=jax.random.wrap_key_data(restored["rng"]))
        if not with_iter:
            return new_state
        iter_state = None
        raw = restored.get("iter_state")
        if raw is not None and int(raw[0]) >= 0:
            from vidcap_tpu.data.pipeline import IteratorState
            s, e, p = [int(x) for x in raw]
            iter_state = IteratorState(seed=s, epoch=e, position=p)
        return new_state, iter_state

    @staticmethod
    def _verify_params_tree(template, restored) -> None:
        """Raise if the checkpoint's params don't structurally match the model
        template (same tree, same leaf shapes)."""
        if restored is None:
            raise ValueError("checkpoint has no 'params' entry — corrupt or "
                             "foreign checkpoint")
        t_want = jax.tree_util.tree_structure(template)
        t_got = jax.tree_util.tree_structure(restored)
        if t_want != t_got:
            raise ValueError(
                f"checkpoint params tree does not match the model template:\n"
                f"  template: {t_want}\n  checkpoint: {t_got}")
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(template),
                                jax.tree_util.tree_leaves(restored)):
            if tuple(a.shape) != tuple(b.shape):
                name = jax.tree_util.keystr(path)
                raise ValueError(
                    f"checkpoint param {name} has shape {tuple(b.shape)}, "
                    f"model expects {tuple(a.shape)}")

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
