"""Quality-grounded int8 A/B (follow-up to scripts/bench_beam_int8.py).

The bench measured w8a8 at +10.8% caps/s with a 66% beam-caption mismatch —
but on RANDOM weights, where top-k margins are near zero and any logit
perturbation flips beams. The adoption question is about quality on a
TRAINED model: decode the real at-scale val split (500 videos) with the
production bf16 beam and the w8a8 variant off the same checkpoint, and score
both with the host eval stack. If val CIDEr is preserved, the +10.8% is
adoptable; if not, the rule-out gets its quality number.

Usage: python scripts/eval_int8_quality.py [ckpt_dir] [out_json]
"""
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

from vidcap_tpu.ops.int8_proj import int8_logits, quantize_out_proj


def main(ckpt="checkpoints/r5b_horizon", out_path="artifacts/r5_int8_quality.json"):
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses

    from vidcap_tpu.cli.main import _load_dataset
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.inference import Captioner
    from vidcap_tpu.metrics.evaluate import evaluate_captions
    from vidcap_tpu.models.decoding import (beam_decode, beam_decode_pool,
                                            tile_recurrent, use_finished_pool)
    from vidcap_tpu.models.model import VidCapModel

    cfg = get_preset("msrvtt_attn_beam5")
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, data_dir="data/scale"))
    val = _load_dataset(cfg, split="val")
    cap = Captioner.from_checkpoint(cfg, val, ckpt)
    model, params = cap.model, cap.params
    K = cfg.decode.beam_width
    bf16 = cfg.model.compute_dtype == "bfloat16"

    W8, wscale, bq = quantize_out_proj(params, val.vocab.size)

    def base_step(state, tok):
        return model.apply({"params": params}, state, tok, K, bf16,
                           method=VidCapModel.step_beam)

    def w8a8_step(state, tok):
        state2, h = model.apply({"params": params}, state, tok, K,
                                method=VidCapModel.step_beam_hidden)
        return state2, int8_logits(h, W8, wscale, bq)

    decode_fn = (beam_decode_pool if use_finished_pool(cfg.decode)
                 else beam_decode)
    feats = np.asarray(val.features, np.float32)
    N = feats.shape[0]
    B = 100
    pad = (-N) % B
    if pad:
        feats = np.concatenate([feats, np.zeros((pad,) + feats.shape[1:],
                                                np.float32)])

    def make_decode(step):
        @jax.jit
        def run(f):
            st = tile_recurrent(model.apply({"params": params}, f,
                                            method=VidCapModel.init_state), K)
            return decode_fn(step, st, batch=B, max_len=cfg.decode.max_len,
                             beam_width=K,
                             length_penalty=cfg.decode.length_penalty,
                             early_exit=cfg.decode.early_exit)[0]
        return run

    report = {"checkpoint": ckpt, "val_videos": N, "beam_width": K}
    toks_by_variant = {}
    for name, step in (("base_bf16", base_step), ("w8a8", w8a8_step)):
        run = make_decode(step)
        chunks = [jnp.asarray(feats[i:i + B]) for i in range(0, len(feats), B)]
        _ = np.asarray(run(chunks[0]))                       # compile
        t0 = time.perf_counter()
        toks = np.concatenate([np.asarray(run(c)) for c in chunks])[:N]
        dt = time.perf_counter() - t0
        toks_by_variant[name] = toks
        results = {vid: [val.vocab.decode_str(row)]
                   for vid, row in zip(val.video_ids, toks)}
        refs = {v: val.video_captions[v] for v in results
                if val.video_captions.get(v)}
        scores = evaluate_captions(refs, {v: results[v] for v in refs})
        report[name] = {"caps_per_s_per_dispatch": round(N / dt),
                        **{k: round(v, 4) for k, v in scores.items()}}
        print(name, json.dumps(report[name]), flush=True)

    mism = (toks_by_variant["base_bf16"] != toks_by_variant["w8a8"]
            ).any(-1).mean()
    report["caption_mismatch"] = round(float(mism), 4)
    report["cider_delta_w8a8_minus_base"] = round(
        report["w8a8"]["CIDEr"] - report["base_bf16"]["CIDEr"], 4)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(*(_sys.argv[1:3]))
