"""METEOR (SURVEY.md C16, §2.2: the reference vendors Java ``meteor-1.5.jar``).

Offline-eval-only metric; never on the device reward path (SURVEY.md §2.2 marks it a
deliberate device non-goal). Two backends:

  1. If a METEOR jar + JVM are available (``VIDCAP_METEOR_JAR`` env var), shell out —
     exact parity with the reference toolkit.
  2. Otherwise a pure-Python approximation: METEOR-style unigram alignment with
     exact + suffix-stem matching, the harmonic mean (alpha=0.9) and the standard
     fragmentation penalty (gamma=0.5, beta=3). Clearly labelled approximate.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Dict, List, Sequence, Tuple

Tokens = Sequence[str]

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5


def _stem(w: str) -> str:
    """Cheap suffix stemmer (porter-lite) for approximate matching."""
    for suf in ("ing", "edly", "ed", "es", "s", "ly"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


def _align(ref: Tokens, cand: Tokens) -> Tuple[int, int]:
    """Greedy two-stage (exact, then stem) unigram alignment.
    Returns (num_matches, num_chunks)."""
    matched_ref = [False] * len(ref)
    align = [-1] * len(cand)
    for stage in (0, 1):
        for i, w in enumerate(cand):
            if align[i] >= 0:
                continue
            for j, r in enumerate(ref):
                if matched_ref[j]:
                    continue
                ok = (w == r) if stage == 0 else (_stem(w) == _stem(r))
                if ok:
                    align[i] = j
                    matched_ref[j] = True
                    break
    pairs = [(i, j) for i, j in enumerate(align) if j >= 0]
    m = len(pairs)
    chunks = 0
    prev = None
    for i, j in pairs:
        if prev is None or j != prev + 1:
            chunks += 1
        prev = j
    return m, chunks


def meteor_sentence(refs: List[Tokens], cand: Tokens) -> float:
    """Approximate METEOR: max over references."""
    if not cand:
        return 0.0
    best = 0.0
    for ref in refs:
        if not ref:
            continue
        m, chunks = _align(ref, cand)
        if m == 0:
            continue
        p = m / len(cand)
        r = m / len(ref)
        fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
        frag = chunks / m
        score = fmean * (1 - GAMMA * frag ** BETA)
        best = max(best, score)
    return best


def meteor(gts: Dict[str, List[Tokens]], res: Dict[str, Tokens]
           ) -> Tuple[float, Dict[str, float]]:
    jar = os.environ.get("VIDCAP_METEOR_JAR")
    if jar and os.path.exists(jar) and shutil.which("java"):
        return _meteor_jar(jar, gts, res)
    per = {vid: meteor_sentence(gts[vid], cand) for vid, cand in res.items()}
    return sum(per.values()) / max(len(per), 1), per


def _meteor_jar(jar: str, gts, res):  # pragma: no cover - needs JVM asset
    """Exact METEOR via the reference toolkit's jar protocol."""
    vids = list(res.keys())
    proc = subprocess.Popen(
        ["java", "-jar", "-Xmx2G", jar, "-", "-", "-stdio", "-l", "en",
         "-norm"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True)
    scores = {}
    eval_line = "EVAL"
    for vid in vids:
        cand = " ".join(res[vid])
        refs = "|||".join(" ".join(r) for r in gts[vid])
        proc.stdin.write(f"SCORE ||| {refs} ||| {cand}\n")
    proc.stdin.flush()
    stats = [proc.stdout.readline().strip() for _ in vids]
    for s in stats:
        eval_line += f" ||| {s}"
    proc.stdin.write(eval_line + "\n")
    proc.stdin.flush()
    for vid in vids:
        scores[vid] = float(proc.stdout.readline().strip())
    final = float(proc.stdout.readline().strip())
    proc.stdin.close()
    proc.wait()
    return final, scores
