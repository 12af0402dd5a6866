"""Train state + optimizer (SURVEY.md C17).

Replaces the reference's Adam + grad-clip + ``tf.train.Saver`` session plumbing with
an optax chain and a flax struct the jitted steps thread through with buffer donation.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vidcap_tpu.config import Config

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    step: Array                 # i32 scalar
    params: Any
    opt_state: Any
    rng: Array                  # PRNG key threaded through sampling steps
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)


def make_lr_schedule(t):
    """Learning-rate schedule from a TrainConfig (SURVEY.md C17 "LR
    schedule"): optional linear warmup to ``learning_rate``, then
    constant / cosine-decay (to ``lr_decay_rate·lr`` over
    ``lr_decay_steps``, default ``num_steps``) / smooth exponential decay
    (×``lr_decay_rate`` every ``lr_decay_steps``). Returns a float for the
    plain constant case (optax accepts either)."""
    peak = t.learning_rate
    decay_steps = t.lr_decay_steps if t.lr_decay_steps > 0 else t.num_steps
    if t.lr_schedule == "constant":
        base = peak
    elif t.lr_schedule == "cosine":
        base = optax.cosine_decay_schedule(peak, decay_steps,
                                           alpha=t.lr_decay_rate)
    elif t.lr_schedule == "exponential":
        base = optax.exponential_decay(peak, decay_steps, t.lr_decay_rate)
    else:
        raise ValueError(f"unknown lr_schedule {t.lr_schedule!r}; "
                         "use constant | cosine | exponential")
    if t.warmup_steps <= 0:
        return base
    warm = optax.linear_schedule(0.0, peak, t.warmup_steps)
    if not callable(base):
        base = optax.constant_schedule(base)
    # join_schedules rebases the count at each boundary, so the decay
    # clock starts when the warmup ends
    return optax.join_schedules([warm, base], [t.warmup_steps])


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    if t.stage == "scst":
        # policy-gradient fine-tuning needs a much smaller LR than XE; the
        # XE rate demonstrably collapses a trained policy (SURVEY.md C13).
        # The implicit /20 default is announced loudly so configs written
        # against "learning_rate IS the SCST rate" aren't silently retuned.
        if t.scst_learning_rate is not None:
            lr = t.scst_learning_rate
        else:
            lr = t.learning_rate / 20.0
            import sys
            print(f"[vidcap] SCST stage: scst_learning_rate unset — using "
                  f"learning_rate/20 = {lr:g} (set train.scst_learning_rate "
                  f"to override)", file=sys.stderr)
        t = dataclasses.replace(t, learning_rate=lr)
    schedule = make_lr_schedule(t)
    def _adam(sched):
        """One inner optimizer, shared by every parameter group — weight decay
        and the warmup schedule apply identically whichever group owns the
        param (a per-group rebuild that silently drops adamw/warmup was a
        round-1 advisor finding)."""
        if t.weight_decay > 0:
            return optax.adamw(sched, weight_decay=t.weight_decay)
        return optax.adam(sched)

    chain = [optax.clip_by_global_norm(t.grad_clip_norm)]
    # any stage that fine-tunes THROUGH the CNN gets the scaled backbone LR:
    # the plain e2e stage, and the composed flagship (stage='scst' with
    # use_backbone — SURVEY.md §3.5, preset e2e_scst_multitask)
    through_cnn = t.stage == "e2e" or (t.stage == "scst"
                                       and cfg.model.use_backbone)
    if through_cnn and t.backbone_lr_scale != 1.0:
        # smaller LR through the CNN (SURVEY.md §3.5): scale the SCHEDULE, so
        # the backbone group keeps warmup shape + weight decay, just rescaled.
        scale = t.backbone_lr_scale
        bb_schedule = ((lambda count: schedule(count) * scale)
                       if callable(schedule) else schedule * scale)

        def scale_backbone(path_tree):
            return jax.tree_util.tree_map_with_path(
                lambda p, _: "backbone" if any(
                    getattr(k, "key", None) == "backbone" for k in p)
                else "rest", path_tree)

        # NOTE: multi_transform's opt_state STRUCTURE differs from the plain
        # adam chain, so a staged xe→e2e resume must restore params only and
        # re-init the optimizer. train.loop detects the stage change via the
        # stage recorded in the checkpoint sidecar (CheckpointManager.
        # saved_stage) and routes it through restore_params_only; legacy
        # stage-less checkpoints fall back via try/except on the structural
        # restore error.
        chain.append(optax.multi_transform(
            {"backbone": _adam(bb_schedule), "rest": _adam(schedule)},
            scale_backbone))
    else:
        chain.append(_adam(schedule))
    return optax.chain(*chain)


def create_train_state(cfg: Config, params, seed: Optional[int] = None
                       ) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=jax.random.key(seed if seed is not None else cfg.train.seed),
        tx=tx,
    )
