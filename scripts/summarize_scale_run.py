"""Summarize an at-scale staged-run log (VERDICT r3 next #2/#3): extract the
wall-clock, steps/s at real logging/eval/ckpt cadence, and the val-CIDEr curve
from a train --stages xe,scst --log-file jsonl.

    python scripts/summarize_scale_run.py /path/train_log.jsonl [out.json]
"""
from __future__ import annotations

import json
import sys


def summarize(path: str) -> dict:
    rows = [json.loads(l) for l in open(path) if l.strip()]
    train_rows = [r for r in rows if "steps_per_sec" in r]
    eval_rows = [r for r in rows if "eval_CIDEr" in r]
    # stage boundary: the step counter is cumulative; SCST rows carry
    # reward_sample
    scst_rows = [r for r in train_rows if "reward_sample" in r]
    xe_rows = [r for r in train_rows if "reward_sample" not in r]

    def sps(rows):
        # drop each stage's first logged window (contains the compile)
        vals = sorted(r["steps_per_sec"] for r in rows[1:]) or \
            [r["steps_per_sec"] for r in rows]
        return vals[len(vals) // 2]

    out = {
        "wall_s_total": rows[-1]["wall_s"] if rows else None,
        "xe": {
            "logged_rows": len(xe_rows),
            "median_steps_per_sec": round(sps(xe_rows), 2) if xe_rows else None,
            "first_loss": xe_rows[0]["loss"] if xe_rows else None,
            "last_loss": xe_rows[-1]["loss"] if xe_rows else None,
        },
        "scst": {
            "logged_rows": len(scst_rows),
            "median_steps_per_sec": round(sps(scst_rows), 2)
            if scst_rows else None,
            "first_reward_sample": scst_rows[0]["reward_sample"]
            if scst_rows else None,
            "last_reward_sample": scst_rows[-1]["reward_sample"]
            if scst_rows else None,
        },
        "val_cider_curve": [
            {"step": r["step"], "CIDEr": round(r["eval_CIDEr"], 4),
             "Bleu_4": round(r.get("eval_Bleu_4", float("nan")), 4)}
            for r in eval_rows],
    }
    if eval_rows:
        xe_end = [r for r in eval_rows
                  if r["step"] <= (xe_rows[-1]["step"] if xe_rows else 0)]
        out["val_cider_end_of_xe"] = (round(xe_end[-1]["eval_CIDEr"], 4)
                                      if xe_end else None)
        out["val_cider_final"] = round(eval_rows[-1]["eval_CIDEr"], 4)
    return out


if __name__ == "__main__":
    s = summarize(sys.argv[1])
    print(json.dumps(s, indent=1))
    if len(sys.argv) > 2:
        json.dump(s, open(sys.argv[2], "w"), indent=1)
