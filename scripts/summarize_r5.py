"""Aggregate the round-5 evidence suites (scripts/r5_suite.sh, r5_suite2.sh,
r5_suite3.sh) into ONE artifact: artifacts/R5_EVIDENCE.json (VERDICT r4
next #1–#4 and #7).

Sections:
  multitask_ablation — attr_w 0.2 vs 0.0 × matched seeds. XE endpoints come
    from the staged arm logs (r5_ab_w*.jsonl); the SCST endpoints come from
    the RECOVERED-recipe reruns (scst_learning_rate=5e-5, r5_b_w*.jsonl)
    which resume each arm's frozen XE-2500 snapshot. Paired deltas at both
    phases, mean ± spread.
  scst_seed_sweep    — the SCST stage repeated off ONE frozen XE checkpoint
    under different rng salts at 5e-5 (r5_b_salt*.jsonl + the seed-0 rerun
    as salt 0): val-CIDEr delta per run, mean ± spread (is the single-seed
    +0.016 of r4 real?).
  scst_seed_sweep_lr5e-6 — the suite-1 arms at the DEFAULT lr/20 recipe
    (historical; established mildly negative before the r4 recipe was
    recovered by bit-fingerprint — see scripts/r5_suite2.sh header).
  scst_undertrained  — SCST off the step-1000 XE checkpoint (val CIDEr
    ~0.32): the regime with actual RL headroom, 3 salts.
  scst_horizon       — 5000-step SCST run: full val curve, where it
    saturates, and whether the r4 step-3000 dip recurs.
  mixed_reward       — the cider_bleu (0.7·CIDEr-D + 0.3·BLEU4) training run
    next to the pure-CIDEr arm.
  beam_vs_greedy     — decode-method A/B on the trained checkpoints at
    production dims (the headline decode tied to a quality number).
  int8_vocab_projection — in-situ full-decode A/B of int8 W_out variants
    (caps/s + token-mismatch rate vs the bf16 production path).

Usage: python scripts/summarize_r5.py  [--dir artifacts]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys

XE_END_STEP = 2500
UT_XE_STEP = 1000


def _rows(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def _evals(rows):
    # None, not float('nan'): json.dump would emit a bare NaN token that
    # strict JSON parsers (jq, JSON.parse) reject
    return {r["step"]: {"CIDEr": round(r["eval_CIDEr"], 4),
                        "Bleu_4": (round(r["eval_Bleu_4"], 4)
                                   if "eval_Bleu_4" in r else None)}
            for r in rows if "eval_CIDEr" in r}


def _stats(path):
    rows = _rows(path)
    ev = _evals(rows)
    final_step = max(ev) if ev else None
    out = {
        "evals": ev,
        "xe_end": ev.get(XE_END_STEP),
        "final": ev.get(final_step) if final_step else None,
        "final_step": final_step,
    }
    scst = [r for r in rows if "reward_sample" in r]
    if scst:
        out["reward_first"] = round(scst[0]["reward_sample"], 4)
        out["reward_last"] = round(scst[-1]["reward_sample"], 4)
    attr = [r["attr_loss"] for r in rows if "attr_loss" in r]
    if attr:
        out["attr_loss_first"] = round(attr[0], 4)
        out["attr_loss_last"] = round(attr[-1], 4)
    xe = [r for r in rows if "xe_loss" in r and "reward_sample" not in r]
    if xe:
        # the XE TERM, not the stage total (loss = xe + attr_w*attr + ...):
        # the ablation compares attr-on vs attr-off arms, and the total would
        # bias attr-on high by construction (review r5)
        out["xe_final_loss"] = xe[-1]["xe_loss"]
        out["stage_final_total_loss"] = xe[-1]["loss"]
    return out


def _mean_std(vals):
    vals = list(vals)
    return {"mean": round(statistics.mean(vals), 4),
            "std": round(statistics.stdev(vals), 4) if len(vals) > 1 else 0.0,
            "n": len(vals), "values": [round(v, 4) for v in vals]}


def _load(d, name):
    p = os.path.join(d, name)
    return _stats(p) if os.path.exists(p) else None


def summarize(d):
    out = {}

    # per-arm XE logs and recovered-recipe SCST reruns
    xe_arms, scst_arms = {}, {}
    for w in ("0.2", "0.0"):
        for s in (0, 1, 2):
            a = _load(d, f"r5_ab_w{w}_s{s}.jsonl")
            if a:
                xe_arms[(w, s)] = a
            b = _load(d, f"r5_b_w{w}_s{s}.jsonl")
            if b:
                scst_arms[(w, s)] = b

    # ---- multitask ablation ----------------------------------------------
    if xe_arms:
        ab = {"recipe": "xe 2500 steps; scst +1500 @ lr 5e-5 (r4 recipe, "
                        "bit-fingerprint-recovered) resumed from the frozen "
                        "XE-2500 snapshot",
              "arms": {}}
        for (w, s), a in sorted(xe_arms.items()):
            arm = {"xe_end": a.get("xe_end") or a.get("final"),
                   "xe_final_loss": a.get("xe_final_loss")}
            b = scst_arms.get((w, s))
            if b:
                arm["scst_final"] = b.get("final")
                arm["scst_evals"] = b.get("evals")
            ab["arms"][f"attr{w}_seed{s}"] = arm
        for phase, src in (("xe_end", xe_arms), ("scst_final", scst_arms)):
            deltas = []
            for s in (0, 1, 2):
                a, b = src.get(("0.2", s)), src.get(("0.0", s))
                key = "xe_end" if phase == "xe_end" else "final"
                if a and b and a.get(key) and b.get(key):
                    deltas.append(a[key]["CIDEr"] - b[key]["CIDEr"])
            if deltas:
                ab[f"cider_delta_attr_on_minus_off_{phase}"] = \
                    _mean_std(deltas)
        # paired ON-OFF delta at EVERY eval step of the XE phase — shows the
        # attr-head effect across the whole training trajectory, not just at
        # the (possibly saturated) endpoint
        by_step = {}
        for s in (0, 1, 2):
            a, b = xe_arms.get(("0.2", s)), xe_arms.get(("0.0", s))
            if not (a and b):
                continue
            for step in sorted(set(a["evals"]) & set(b["evals"])):
                if step <= XE_END_STEP:
                    by_step.setdefault(step, []).append(
                        a["evals"][step]["CIDEr"] - b["evals"][step]["CIDEr"])
        if by_step:
            ab["cider_delta_attr_on_minus_off_by_step"] = {
                str(k): _mean_std(v) for k, v in sorted(by_step.items())}
        # the aux head itself trains (BCE trajectory) even where the caption
        # metric is unchanged — separates "head broken" from "signal redundant"
        heads = {f"attr0.2_seed{s}":
                 {"attr_loss_first": a["attr_loss_first"],
                  "attr_loss_last": a["attr_loss_last"]}
                 for s in (0, 1, 2)
                 for a in [xe_arms.get(("0.2", s))]
                 if a and "attr_loss_first" in a}
        if heads:
            ab["attr_head_bce_trajectory"] = heads
        for w in ("0.2", "0.0"):
            xes = [a["xe_end"]["CIDEr"] for (ww, _), a in xe_arms.items()
                   if ww == w and a.get("xe_end")]
            if xes:
                ab[f"xe_end_cider_attr{w}"] = _mean_std(xes)
            fins = [b["final"]["CIDEr"] for (ww, _), b in scst_arms.items()
                    if ww == w and b.get("final")]
            if fins:
                ab[f"scst_final_cider_attr{w}"] = _mean_std(fins)
        out["multitask_ablation"] = ab

    xe_base = xe_arms.get(("0.2", 0))
    xe_end = (xe_base["xe_end"]["CIDEr"]
              if xe_base and xe_base.get("xe_end") else None)

    # ---- SCST seed sweep at the recovered recipe ---------------------------
    sweep = {}
    b0 = scst_arms.get(("0.2", 0))
    if b0 and b0.get("final"):
        sweep["salt0 (ablation seed-0 rerun)"] = b0["final"]["CIDEr"]
    for p in sorted(glob.glob(os.path.join(d, "r5_b_salt*.jsonl"))):
        name = os.path.basename(p)[len("r5_b_"):-len(".jsonl")]
        st = _stats(p)
        if st.get("final"):
            sweep[name] = st["final"]["CIDEr"]
    if sweep and xe_end is not None:
        finals = list(sweep.values())
        out["scst_seed_sweep"] = {
            "recipe": "scst_learning_rate=5e-5 (recovered r4 recipe)",
            "xe_checkpoint_val_cider": xe_end,
            "final_val_cider_per_salt": sweep,
            "final": _mean_std(finals),
            "delta_vs_xe": _mean_std([v - xe_end for v in finals]),
        }

    # ---- historical: suite-1 arms at the default lr/20 ---------------------
    legacy = {}
    for s in (0, 1, 2):
        a = xe_arms.get(("0.2", s))
        if a and a.get("final") and a.get("xe_end") \
                and a["final_step"] and a["final_step"] > XE_END_STEP:
            legacy[f"seed{s}"] = round(
                a["final"]["CIDEr"] - a["xe_end"]["CIDEr"], 4)
    if legacy:
        out["scst_seed_sweep_lr5e-6"] = {
            "note": "suite-1 staged runs at the DEFAULT scst lr (xe lr/20 = "
                    "5e-6) — pre-recovery; mildly negative on a saturated "
                    "XE checkpoint",
            "delta_vs_xe_per_seed": legacy,
            "delta_vs_xe": _mean_std(legacy.values()),
        }

    # ---- under-trained regime ----------------------------------------------
    ut = {}
    ut_base = None
    if xe_base and xe_base["evals"].get(UT_XE_STEP):
        ut_base = xe_base["evals"][UT_XE_STEP]["CIDEr"]
    for p in sorted(glob.glob(os.path.join(d, "r5_b_ut*.jsonl"))):
        name = os.path.basename(p)[len("r5_b_"):-len(".jsonl")]
        st = _stats(p)
        if st.get("final"):
            ut[name] = st["final"]["CIDEr"]
    if ut:
        sec = {"xe_step1000_val_cider": ut_base,
               "final_val_cider_per_salt": ut,
               "final": _mean_std(ut.values())}
        if ut_base is not None:
            sec["delta_vs_xe"] = _mean_std([v - ut_base for v in ut.values()])
        out["scst_undertrained"] = sec

    # ---- horizon ------------------------------------------------------------
    st = _load(d, "r5_b_horizon5k.jsonl")
    if st and st["evals"]:
        curve = dict(st["evals"])
        # suite6 B / suite7 A: salt-0 resumed to 12.5k then 20k
        for extname in ("r5_b_horizon12k.jsonl", "r5_b_horizon20k.jsonl",
                        "r5_b_horizon30k.jsonl"):
            ext = _load(d, extname)
            if ext and ext["evals"]:
                curve.update(ext["evals"])
        best_step = max(curve, key=lambda k: curve[k]["CIDEr"])
        final_step = max(curve)
        sec = {
            "scst_steps": final_step - XE_END_STEP, "curve": curve,
            "best": {"step": best_step, **curve[best_step]},
            "final": curve[final_step],
            "delta_vs_xe": (round(curve[final_step]["CIDEr"] - xe_end, 4)
                            if xe_end is not None else None),
        }
        # suite6 A: the full horizon repeated under salts 1..2 — seed spread
        # on the headline lift (finals at the salt-0 run's 7500-step point)
        hz = {"salt0": curve.get(7500, curve[final_step])["CIDEr"]}
        for p in sorted(glob.glob(os.path.join(d, "r5_b_hz_salt*.jsonl"))):
            name = os.path.basename(p)[len("r5_b_hz_"):-len(".jsonl")]
            s = _stats(p)
            if s.get("final"):
                hz[name] = s["final"]["CIDEr"]
        if len(hz) > 1 and xe_end is not None:
            sec["salt_spread_at_7500"] = {
                "final_per_salt": hz,
                "delta_vs_xe": _mean_std([v - xe_end for v in hz.values()]),
            }
        out["scst_horizon"] = sec

    # ---- small-data ablation (suite5: data/scale_small, 500 train videos) ---
    sd_arms = {}
    for w in ("0.2", "0.0"):
        for s in (0, 1, 2):
            a = _load(d, f"r5_sd_w{w}_s{s}.jsonl")
            if a and a["evals"]:
                sd_arms[(w, s)] = a
    if sd_arms:
        sd = {"regime": "500 of 5000 train videos captioned (10k pairs; "
                        "shapes/vocab identical to data/scale), staged "
                        "xe 2500 -> scst +1500 @ lr 5e-5",
              "arms": {f"attr{w}_seed{s}":
                       {"xe_end": a.get("xe_end"), "final": a.get("final"),
                        "evals": a["evals"]}
                       for (w, s), a in sorted(sd_arms.items())}}
        for phase, key in (("xe_end", "xe_end"), ("scst_final", "final")):
            deltas = []
            for s in (0, 1, 2):
                a, b = sd_arms.get(("0.2", s)), sd_arms.get(("0.0", s))
                if a and b and a.get(key) and b.get(key):
                    deltas.append(a[key]["CIDEr"] - b[key]["CIDEr"])
            if deltas:
                sd[f"cider_delta_attr_on_minus_off_{phase}"] = \
                    _mean_std(deltas)
        for w in ("0.2", "0.0"):
            fins = [a["final"]["CIDEr"] for (ww, _), a in sd_arms.items()
                    if ww == w and a.get("final")]
            if fins:
                sd[f"final_cider_attr{w}"] = _mean_std(fins)
        out["multitask_ablation_smalldata"] = sd

    # ---- mixed reward --------------------------------------------------------
    st = _load(d, "r5_b_mixed.jsonl")
    if st and st["evals"]:
        out["mixed_reward"] = {
            "reward": "0.7*CIDEr-D + 0.3*BLEU4 (scst_reward=cider_bleu, "
                      "bleu_mix=0.3) @ lr 5e-5",
            "evals": st["evals"], "final": st.get("final"),
            "reward_first": st.get("reward_first"),
            "reward_last": st.get("reward_last"),
            "delta_vs_xe": (round(st["final"]["CIDEr"] - xe_end, 4)
                            if st.get("final") and xe_end is not None
                            else None),
        }

    # ---- beam-riding periodic eval (suite9) ----------------------------------
    st = _load(d, "r5_b_beameval.jsonl")
    if st and st["evals"]:
        out["beam_riding_eval"] = {
            "note": "train.eval_method=beam: periodic val eval AND best-ckpt "
                    "selection scored under the deployment beam-5 decode "
                    "(same +1500-step SCST arm as the greedy-eval salt-0 run)",
            "evals": st["evals"], "final": st.get("final"),
        }

    # ---- beam vs greedy -------------------------------------------------------
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

    # ---- int8 vocab projection --------------------------------------------------
    q = {}
    for p in sorted(glob.glob(os.path.join(d, "r5_int8_*.json"))):
        tag = os.path.basename(p)[len("r5_int8_"):-len(".json")]
        try:
            with open(p) as f:
                q[tag] = json.load(f)
        except (json.JSONDecodeError, OSError):
            pass
    if q:
        out["int8_vocab_projection"] = q

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
