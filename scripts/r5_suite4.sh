#!/bin/bash
# Optional round-5 arm (VERDICT r4 next #1, "if budget allows"): the
# multitask ablation in the COMPOSED-E2E (pixels) regime — the r4 composed
# demo (artifacts/COMPOSED_DEMO_r4.json) rerun as a matched pair,
# attribute_loss_weight 0.2 vs 0.0, same seed/fixture. Wall is dominated by
# this environment's 223 MB/step pixel tunnel (~0.09 steps/s), so the pair
# costs ~3h — launch only with slack after scripts/r5_suite3.sh.
set -u
cd /root/repo
PY="python -m vidcap_tpu"
STATUS=artifacts/r5_suite4_status.log
note () { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

note "=== r5 suite4 (composed-pixels ablation) begin ==="
for w in 0.2 0.0; do
  tag="e2e_w$w"
  rm -rf "checkpoints/r5_$tag"
  note "composed $tag start"
  $PY train --preset e2e_scst_multitask --stages xe,scst --steps 200,120 \
      --eval-every 50 --log-every 10 \
      --set train.attribute_loss_weight=$w --set train.seed=0 \
      --checkpoint-dir "checkpoints/r5_$tag" \
      --log-file "artifacts/r5_$tag.jsonl" \
      >> artifacts/r5_suite4_stderr.log 2>&1
  note "composed $tag done rc=$?"
done
note "=== r5 suite4 end ==="
