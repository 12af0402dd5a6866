"""The COMPOSED flagship step (`e2e_scst_multitask`) at preset shapes on the
real chip (VERDICT r3 next #1): pixels [B, T, 299, 299, 3] → IRv2 → fused
dual rollout → on-device CIDEr → PG + XE anchor + attribute BCE, backbone
encoded ONCE, one jitted step.

Also measures the NAIVE composition (the pre-r4 semantics: every consumer
re-encodes pixels — frozen rollout init at B, the anchor-folded re-score at
2B, and the attribute head at B ⇒ ~4 backbone fwds + 3 bwds per step) for an
A/B of the shared-encode restructuring. Both A and B compute the same loss.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_composed_preset.py [B] [T] [iters] [accum]

With accum > 1 the harness measures the grad-accumulation path
(cfg.train.grad_accum): batch B split into accum microbatches scanned inside
ONE jitted step — the single-chip route to large EFFECTIVE batch for the
backbone-bound composed stage (e.g. B=64 accum=8 ⇒ effective 64 where the
monolithic B=64 graph cannot fit activations).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def build_prod_vocab_dataset(cfg_data, num_videos=64):
    """64-video corpus whose captions tokenize under the FULL 16k lexicon —
    reward tables then have production-sized id space (out_proj/embedding
    shapes match deployment)."""
    from scripts.make_scale_corpus import (_SUBJECTS, _VERBS,
                                           make_scale_corpus)
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.data.vocab import SPECIALS, Vocab

    feats, ids, caps = make_scale_corpus(
        num_videos, num_frames=cfg_data.num_frames, feature_dim=8,
        clusters=500, pool=32, seed=0)
    words = ([f"w{i:05d}" for i in range(500 * 32)]
             + _SUBJECTS + _VERBS + ["a", "is"])
    id_to_word = SPECIALS + words
    vocab = Vocab({w: i for i, w in enumerate(id_to_word)}, id_to_word)
    ds_cfg = dataclasses.replace(cfg_data, feature_dim=8)
    return CaptionDataset(feats, ids, caps, ds_cfg, vocab=vocab)


def make_naive_composed_step(model, cfg, tables):
    """Pre-r4 composition: each consumer encodes pixels itself."""
    from vidcap_tpu.models.decoding import (Rollout, dual_rollout,
                                            duplicate_state)
    from vidcap_tpu.models.model import VidCapModel
    from vidcap_tpu.objectives.multitask import attribute_bce_loss
    from vidcap_tpu.objectives.reward import scst_reward
    from vidcap_tpu.objectives.scst import scst_loss
    from vidcap_tpu.objectives.xe import masked_xe_loss, shift_right
    from vidcap_tpu.train.steps import optax_global_norm

    max_len = cfg.decode.max_len

    def loss_fn(params, batch, rng):
        pixels = batch["features"]
        B = pixels.shape[0]
        frozen = jax.lax.stop_gradient(params)

        def frozen_step(state, tok):
            return model.apply({"params": frozen}, state, tok, True,
                               method=VidCapModel.step)

        # encode #1 (frozen): rollout init from PIXELS
        state2 = duplicate_state(
            model.apply({"params": frozen}, pixels,
                        method=VidCapModel.init_state), B)
        greedy, s_roll = dual_rollout(frozen_step, state2, B, max_len, rng,
                                      temperature=cfg.decode.temperature)
        # encode #2 (differentiable, at 2B): anchor-folded re-score on PIXELS
        Ls = s_roll.tokens.shape[1]
        Lg = batch["tokens"].shape[1]
        L2 = max(Ls, Lg)
        toks2 = jnp.concatenate([
            jnp.pad(s_roll.tokens, ((0, 0), (0, L2 - Ls))),
            jnp.pad(batch["tokens"], ((0, 0), (0, L2 - Lg)))])
        pixels2 = jnp.concatenate([pixels, pixels])
        logits2 = model.apply({"params": params}, pixels2, None,
                              shift_right(toks2), method=VidCapModel.xe_logits)
        logp_all = jax.nn.log_softmax(
            logits2[:B, :Ls] / jnp.maximum(cfg.decode.temperature, 1e-6), -1)
        logp = jnp.take_along_axis(
            logp_all, s_roll.tokens[..., None], axis=-1)[..., 0]
        sample = Rollout(tokens=s_roll.tokens, logp=logp * s_roll.mask,
                         mask=s_roll.mask)
        xe, _ = masked_xe_loss(logits2[B:, :Lg], batch["tokens"],
                               batch["mask"])

        r_s = scst_reward(tables, batch["video_idx"], sample.tokens,
                          sample.mask, 0.0)
        r_g = scst_reward(tables, batch["video_idx"], greedy.tokens,
                          greedy.mask, 0.0)
        loss, metrics = scst_loss(sample, r_s, r_g)
        loss = loss + cfg.train.scst_xe_mix * xe
        # encode #3 (differentiable): attribute head from PIXELS
        attr = model.apply({"params": params}, pixels,
                           method=VidCapModel.attribute_logits)
        loss = loss + cfg.train.attribute_loss_weight * attribute_bce_loss(
            attr, batch["attributes"])
        metrics["loss"] = loss
        return loss, metrics

    def body(state, batch):
        rng, sub = jax.random.split(state.rng)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sub)
        metrics["grad_norm"] = optax_global_norm(grads)
        return state.apply_gradients(grads).replace(rng=rng), metrics

    return jax.jit(body, donate_argnums=(0,))


def bench_step(step, state, batches, iters):
    state, m = step(state, batches[0])
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batches[i % len(batches)])
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return iters / dt, float(m["loss"])


def main(B=8, T=26, iters=10, accum=1):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.model import create_model, init_params
    from vidcap_tpu.objectives.reward_tables import tables_from_dataset
    from vidcap_tpu.train.loop import batch_to_device_dict
    from vidcap_tpu.train.scst import make_scst_step
    from vidcap_tpu.train.state import create_train_state

    cfg = get_preset("e2e_scst_multitask")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, dataset="synthetic", num_frames=T),
        train=dataclasses.replace(cfg.train, batch_size=B, grad_accum=accum))
    S = cfg.data.frame_size
    ds = build_prod_vocab_dataset(cfg.data)
    tables = tables_from_dataset(ds)
    model = create_model(cfg, vocab_size=ds.vocab.size)
    params = init_params(model, cfg, jax.random.key(0))
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f"[composed] B={B} T={T} {S}x{S} vocab={ds.vocab.size} "
          f"params={n_params/1e6:.1f}M accum={accum}", flush=True)

    rng = np.random.default_rng(0)
    it = ds.batches(B, seed=0)

    def pixel_batch():
        b = batch_to_device_dict(next(it))
        b["features"] = jnp.asarray(
            rng.normal(size=(B, T, S, S, 3)).astype(np.float32))
        return jax.device_put(b)

    # accum mode: ONE resident input batch (a second B=64 pixel tensor is
    # 2.7 GB of HBM the activations need); the evolving donated state keeps
    # every dispatch distinct, so the axon identical-dispatch hazard (see
    # CLAUDE.md benchmarking note) does not bite
    batches = [pixel_batch() for _ in range(1 if accum > 1 else 2)]
    jax.block_until_ready(batches)

    results = {}
    state = create_train_state(cfg, params)
    sps, loss = bench_step(make_scst_step(model, cfg, tables=tables),
                           state, batches, iters)
    key = "shared_encode" if accum == 1 else f"grad_accum_{accum}"
    results[key] = {"steps_per_sec": round(sps, 3),
                    "ms_per_step": round(1e3 / sps, 1),
                    "videos_per_sec": round(sps * B, 1),
                    "loss": round(loss, 4)}
    print(f"[composed] {key}: {sps:.3f} steps/s "
          f"({sps * B:.1f} videos/s)", flush=True)

    if accum > 1:   # the naive A/B is an accum=1 story
        print(json.dumps({"metric": "composed_e2e_scst_multitask_step",
                          "B": B, "T": T, "frame": S, "accum": accum,
                          **results}))
        return

    try:
        state = create_train_state(cfg, params)
        sps_n, loss_n = bench_step(make_naive_composed_step(model, cfg,
                                                            tables),
                                   state, batches, iters)
        results["naive_reencode"] = {"steps_per_sec": round(sps_n, 3),
                                     "ms_per_step": round(1e3 / sps_n, 1),
                                     "loss": round(loss_n, 4)}
        results["shared_vs_naive_speedup"] = round(sps / sps_n, 2)
    except Exception as e:   # naive composition may simply not fit
        results["naive_reencode"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps({"metric": "composed_e2e_scst_multitask_step",
                      "B": B, "T": T, "frame": S, **results}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         int(sys.argv[2]) if len(sys.argv) > 2 else 26,
         int(sys.argv[3]) if len(sys.argv) > 3 else 10,
         int(sys.argv[4]) if len(sys.argv) > 4 else 1)
