#!/bin/bash
# Round-5 suite 9 — best-checkpoint selection riding beam-5 (VERDICT r4 #4's
# optional tail): the standard +1500-step SCST arm at the recovered recipe,
# but with train.eval_method=beam, so every periodic val eval AND the
# best-CIDEr checkpoint choice are scored under the deployment decode.
# Reads side-by-side with the greedy-eval arm (r5_b_w0.2_s0.jsonl).
set -u
cd /root/repo
PY="python -m vidcap_tpu"
DATA="--set data.data_dir=data/scale"
COM="--preset msrvtt_attn_beam5 --batch-size 64 --feature-bank --eval-every 500 --log-every 100 $DATA --set train.scst_xe_mix=0.1 --set train.scst_learning_rate=5e-5"
STATUS=artifacts/r5_suite9_status.log
note () { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

note "=== r5 suite9 (beam-riding best-ckpt SCST arm) begin ==="
rm -rf checkpoints/r5b_beameval
cp -r checkpoints/r5_xe_base checkpoints/r5b_beameval
note "scst beameval start"
$PY train $COM --stages scst --steps 4000 --resume \
    --set train.attribute_loss_weight=0.2 \
    --set train.eval_method=beam \
    --checkpoint-dir checkpoints/r5b_beameval \
    --log-file artifacts/r5_b_beameval.jsonl \
    >> artifacts/r5_suite9_stderr.log 2>&1
note "scst beameval done rc=$?"
note "=== r5 suite9 end ==="
