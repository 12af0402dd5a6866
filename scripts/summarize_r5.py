"""Aggregate the round-5 evidence suite (scripts/r5_suite.sh) into ONE
artifact: artifacts/R5_EVIDENCE.json (VERDICT r4 next #1–#4).

Sections:
  multitask_ablation — attr_w 0.2 vs 0.0 × matched seeds: end-of-XE and
    final val CIDEr/BLEU-4 per arm, per-seed paired deltas, mean ± spread.
  scst_seed_sweep    — the SCST stage repeated off ONE frozen XE checkpoint
    under different rng salts: val-CIDEr delta per run, mean ± spread
    (is the single-seed +0.016 of r4 real?).
  scst_horizon       — 5000-step SCST run: the full val curve, where it
    saturates, and whether the r4 step-3000 dip recurs.
  mixed_reward       — the cider_bleu (0.7·CIDEr-D + 0.3·BLEU4) training run
    next to the pure-CIDEr arm.
  beam_vs_greedy     — decode-method A/B on the trained checkpoints at
    production dims (the headline decode tied to a quality number).

Usage: python scripts/summarize_r5.py  [--dir artifacts]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys


def _rows(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def _evals(rows):
    return {r["step"]: {"CIDEr": round(r["eval_CIDEr"], 4),
                        "Bleu_4": round(r.get("eval_Bleu_4", float("nan")), 4)}
            for r in rows if "eval_CIDEr" in r}


def _staged_stats(path, xe_end_step=2500):
    rows = _rows(path)
    ev = _evals(rows)
    final_step = max(ev) if ev else None
    out = {
        "evals": ev,
        "xe_end": ev.get(xe_end_step),
        "final": ev.get(final_step) if final_step else None,
        "final_step": final_step,
    }
    scst = [r for r in rows if "reward_sample" in r]
    if scst:
        out["reward_first"] = round(scst[0]["reward_sample"], 4)
        out["reward_last"] = round(scst[-1]["reward_sample"], 4)
    xe = [r for r in rows if "xe_loss" in r and "reward_sample" not in r]
    if xe:
        out["xe_final_loss"] = xe[-1]["loss"]
    return out


def _mean_std(vals):
    vals = list(vals)
    return {"mean": round(statistics.mean(vals), 4),
            "std": round(statistics.stdev(vals), 4) if len(vals) > 1 else 0.0,
            "n": len(vals), "values": [round(v, 4) for v in vals]}


def summarize(d):
    out = {}

    # ---- multitask ablation ----------------------------------------------
    arms = {}
    for w in ("0.2", "0.0"):
        for s in (0, 1, 2):
            p = os.path.join(d, f"r5_ab_w{w}_s{s}.jsonl")
            if os.path.exists(p):
                arms[(w, s)] = _staged_stats(p)
    if arms:
        ab = {"arms": {f"attr{w}_seed{s}": v for (w, s), v in arms.items()}}
        for phase in ("xe_end", "final"):
            deltas = []
            for s in (0, 1, 2):
                a, b = arms.get(("0.2", s)), arms.get(("0.0", s))
                if a and b and a.get(phase) and b.get(phase):
                    deltas.append(a[phase]["CIDEr"] - b[phase]["CIDEr"])
            if deltas:
                ab[f"cider_delta_attr_on_minus_off_{phase}"] = \
                    _mean_std(deltas)
        for w in ("0.2", "0.0"):
            finals = [arms[(w, s)]["final"]["CIDEr"] for s in (0, 1, 2)
                      if (w, s) in arms and arms[(w, s)].get("final")]
            if finals:
                ab[f"final_cider_attr{w}"] = _mean_std(finals)
        out["multitask_ablation"] = ab

    # ---- SCST seed sweep --------------------------------------------------
    sweep = {}
    base = arms.get(("0.2", 0))
    xe_end = base["xe_end"]["CIDEr"] if base and base.get("xe_end") else None
    if base and base.get("final"):
        sweep["salt0 (ablation seed-0 run)"] = base["final"]["CIDEr"]
    for p in sorted(glob.glob(os.path.join(d, "r5_var_salt*.jsonl"))):
        name = os.path.basename(p)[len("r5_var_"):-len(".jsonl")]
        st = _staged_stats(p)
        if st.get("final"):
            sweep[name] = st["final"]["CIDEr"]
    if sweep and xe_end is not None:
        finals = list(sweep.values())
        out["scst_seed_sweep"] = {
            "xe_checkpoint_val_cider": xe_end,
            "final_val_cider_per_salt": sweep,
            "final": _mean_std(finals),
            "delta_vs_xe": _mean_std([v - xe_end for v in finals]),
        }

    # ---- horizon ----------------------------------------------------------
    p = os.path.join(d, "r5_var_horizon5k.jsonl")
    if os.path.exists(p):
        st = _staged_stats(p)
        curve = st["evals"]
        best_step = max(curve, key=lambda k: curve[k]["CIDEr"])
        out["scst_horizon"] = {
            "steps": 5000, "curve": curve,
            "best": {"step": best_step, **curve[best_step]},
            "final": st.get("final"),
            "delta_vs_xe": (round(st["final"]["CIDEr"] - xe_end, 4)
                            if st.get("final") and xe_end is not None
                            else None),
        }

    # ---- mixed reward -----------------------------------------------------
    p = os.path.join(d, "r5_var_mixed.jsonl")
    if os.path.exists(p):
        st = _staged_stats(p)
        out["mixed_reward"] = {
            "reward": "0.7*CIDEr-D + 0.3*BLEU4",
            "evals": st["evals"], "final": st.get("final"),
            "reward_first": st.get("reward_first"),
            "reward_last": st.get("reward_last"),
            "delta_vs_xe": (round(st["final"]["CIDEr"] - xe_end, 4)
                            if st.get("final") and xe_end is not None
                            else None),
        }

    # ---- beam vs greedy ---------------------------------------------------
    bv = {}
    for p in sorted(glob.glob(os.path.join(d, "r5_valeval_*.json"))):
        tag = os.path.basename(p)[len("r5_valeval_"):-len(".json")]
        try:
            with open(p) as f:
                bv[tag] = {k: round(v, 4) for k, v in json.load(f).items()}
        except (json.JSONDecodeError, OSError):
            pass
    if bv:
        out["beam_vs_greedy"] = bv

    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="artifacts")
    ap.add_argument("--out", default="artifacts/R5_EVIDENCE.json")
    a = ap.parse_args()
    s = summarize(a.dir)
    with open(a.out, "w") as f:
        json.dump(s, f, indent=1)
    json.dump(s, sys.stdout, indent=1)
    print()
