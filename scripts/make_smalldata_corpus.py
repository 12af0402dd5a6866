"""Derive the SMALL-DATA corpus (data/scale_small) from data/scale without
changing a single jit constant: feats/ids/vocab are symlinked (same shapes,
same vocab 16,021 → every XE/SCST graph is already in the compile cache) and
only msrvtt_captions.json changes — train captions are kept for the first
KEEP train videos and emptied for the rest (the loader keeps caption-less
videos aligned with their feature rows and simply contributes no (video,
caption) pairs; verified incl. reward tables).

Purpose (round 5): the attr-head ablation read null at 5k videos — the
mined-attribute signal is redundant with XE there. The one regime where an
aux head plausibly helps is SMALL data, where the multi-hot attr target
aggregates content words across ALL 20 references of a video while each XE
pair sees a single 8-word caption window: a denser per-video signal that can
act as a regularizer. This corpus tests exactly that at 10× less data.

Usage: python scripts/make_smalldata_corpus.py [--keep 500]
"""
from __future__ import annotations

import argparse
import json
import os

SRC = "data/scale"
DST = "data/scale_small"
LINKED = ["msrvtt_train_feats.npy", "msrvtt_val_feats.npy",
          "msrvtt_train_ids.json", "msrvtt_val_ids.json",
          "msrvtt_vocab.json"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep", type=int, default=500)
    a = ap.parse_args()

    os.makedirs(DST, exist_ok=True)
    for f in LINKED:
        dst = os.path.join(DST, f)
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(os.path.join(SRC, f)), dst)

    with open(os.path.join(SRC, "msrvtt_captions.json")) as f:
        caps = json.load(f)
    kept = {f"train_video{i}" for i in range(a.keep)}
    out, n_kept, n_emptied = {}, 0, 0
    for vid, c in caps.items():
        if vid.startswith("train_") and vid not in kept:
            out[vid] = []
            n_emptied += 1
        else:
            out[vid] = c
            n_kept += 1
    with open(os.path.join(DST, "msrvtt_captions.json"), "w") as f:
        json.dump(out, f)
    print(f"[scale_small] kept captions for {n_kept} videos "
          f"(incl. val), emptied {n_emptied} train videos")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
