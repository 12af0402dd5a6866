"""Full benchmark suite (SURVEY.md §6): captions/sec (greedy + beam-5 + sample),
XE and SCST train steps/sec, p50 per-video caption latency. Prints one JSON
object per metric (bench.py stays the single-line headline for the driver).

Run on the real TPU:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_all.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _mk_model(vocab=16_000):
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.model import create_model, init_params
    cfg = get_preset("msrvtt_attn_beam5")
    model = create_model(cfg, vocab_size=vocab)
    params = init_params(model, cfg, jax.random.key(0))
    return cfg, model, params


def _feats(cfg, B, n, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.normal(size=(B, cfg.data.num_frames,
                                         cfg.data.feature_dim)), jnp.float32)
            for _ in range(n)]


def _time(fn, inputs, fetch=np.asarray):
    fetch(fn(inputs[0]))                      # warmup/compile
    fetch(fn(inputs[1]))
    t0 = time.perf_counter()
    for x in inputs[2:]:
        r = fn(x)
    fetch(r)
    return (time.perf_counter() - t0) / (len(inputs) - 2)


def bench_decode(cfg, model, params, B=128, iters=8):
    from vidcap_tpu.models.decoding import (beam_decode, greedy_decode,
                                            sample_decode, tile_state)
    from vidcap_tpu.models.model import VidCapModel
    from vidcap_tpu.ops.pallas_decoder import model_rollout
    L, K, V = 30, 5, 16_000
    feats = _feats(cfg, B, iters + 2)

    def step_fn(state, tok):
        return model.apply({"params": params}, state, tok,
                           method=VidCapModel.step)

    def step_bf16(state, tok):
        return model.apply({"params": params}, state, tok, True,
                           method=VidCapModel.step)

    def init(f):
        return model.apply({"params": params}, f,
                           method=VidCapModel.init_state)

    out = {}
    # tokens-only serving config (matches Captioner): bf16 logits, no logp
    g = jax.jit(lambda f: greedy_decode(step_bf16, init(f), B, L,
                                        with_logp=False).tokens)
    out["greedy_caps_per_s"] = B / _time(g, feats)

    # fused Pallas rollout: VMEM-bound to B<=64 at production dims
    Bp = 64
    featsp = _feats(cfg, Bp, len(feats), seed=1)
    try:
        pg = jax.jit(lambda f: model_rollout(model, params, f,
                                             max_len=L).tokens)
        out["greedy_pallas_caps_per_s_b64"] = Bp / _time(pg, featsp)
    except Exception as e:  # pragma: no cover
        print(f"# pallas rollout bench skipped: {e}", flush=True)

    s = jax.jit(lambda f: sample_decode(step_fn, init(f), B, L,
                                        jax.random.key(0)).tokens)
    out["sample_caps_per_s"] = B / _time(s, feats)

    from vidcap_tpu.models.decoding import tile_recurrent

    def bm(f):
        st = tile_recurrent(init(f), K)

        def sb(s_, tok):
            # keep_compute_dtype=True matches the Captioner/bench.py beam path
            return model.apply({"params": params}, s_, tok, K, True,
                               method=VidCapModel.step_beam)

        return beam_decode(sb, st, batch=B, max_len=L, beam_width=K)[0]

    out["beam5_caps_per_s"] = B / _time(jax.jit(bm), feats)

    # p50 per-video latency, beam=5 batch 8 (BASELINE.json's p50 config)
    fb = _feats(cfg, 8, 12, seed=4)

    def bm8(f):
        st = tile_recurrent(init(f), K)

        def sb(s_, tok):
            return model.apply({"params": params}, s_, tok, K, True,
                               method=VidCapModel.step_beam)

        return beam_decode(sb, st, batch=8, max_len=L, beam_width=K)[0]

    bj = jax.jit(bm8)
    np.asarray(bj(fb[0]))
    lats = []
    for f in fb[1:]:
        t0 = time.perf_counter()
        np.asarray(bj(f))
        lats.append(time.perf_counter() - t0)
    out["p50_latency_ms_beam5_batch8"] = float(np.percentile(lats, 50) * 1e3)

    # p50 per-video latency: single-video batch greedy (serving config)
    f1 = _feats(cfg, 8, 12, seed=3)
    g1 = jax.jit(lambda f: greedy_decode(step_bf16, init(f), 8, L,
                                         with_logp=False).tokens)
    np.asarray(g1(f1[0]))
    lats = []
    for f in f1[1:]:
        t0 = time.perf_counter()
        np.asarray(g1(f))
        lats.append(time.perf_counter() - t0)
    out["p50_latency_ms_batch8"] = float(np.percentile(lats, 50) * 1e3)
    return out


def bench_train(cfg, model, params, B=64, iters=10):
    import dataclasses
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.objectives.reward_tables import tables_from_dataset
    from vidcap_tpu.train.loop import batch_to_device_dict
    from vidcap_tpu.train.scst import make_scst_step
    from vidcap_tpu.train.state import create_train_state
    from vidcap_tpu.train.steps import make_xe_step

    # synthetic corpus with the benchmark model's vocab is impossible (tiny real
    # vocab), so run the train benches on a dataset-sized model instead
    dcfg = dataclasses.replace(cfg.data, dataset="synthetic")
    ds = CaptionDataset.synthetic(dcfg, num_videos=256)
    from vidcap_tpu.models.model import create_model, init_params
    bench_model = create_model(cfg, vocab_size=ds.vocab.size)
    bparams = init_params(bench_model, cfg, jax.random.key(0))

    out = {}
    for stage, maker in (("xe", None), ("scst", None)):
        # match the production scst_cider preset: xe anchor + attribute head on
        scfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, stage=stage,
                                           batch_size=B,
                                           attribute_loss_weight=0.2,
                                           scst_xe_mix=0.1,
                                           donate_state=False))
        if stage == "xe":
            step = make_xe_step(bench_model, scfg)
        else:
            step = make_scst_step(bench_model, scfg,
                                  tables=tables_from_dataset(ds))
        state = create_train_state(scfg, bparams)
        it = ds.batches(B, seed=0)
        # pre-stage batches on device: measure the train step, not the host
        # transfer (which on this tunneled backend costs ~100ms per 10MB and
        # in production overlaps with compute via prefetch)
        batches = [jax.device_put(batch_to_device_dict(next(it)))
                   for _ in range(iters + 2)]
        jax.block_until_ready(batches)
        for b in batches[:2]:
            state, m = step(state, b)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for b in batches[2:]:
            state, m = step(state, b)
        jax.block_until_ready(m["loss"])
        out[f"{stage}_steps_per_s"] = iters / (time.perf_counter() - t0)
    return out


def main():
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    cfg, model, params = _mk_model()
    for bench in (bench_decode, bench_train):
        try:
            for k, v in bench(cfg, model, params).items():
                print(json.dumps({"metric": k, "value": round(float(v), 3)}),
                      flush=True)
        except Exception as e:  # pragma: no cover
            print(f"# {bench.__name__} failed: {e}", flush=True)


if __name__ == "__main__":
    main()
