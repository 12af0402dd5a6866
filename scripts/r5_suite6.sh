#!/bin/bash
# Round-5 suite 6 — put a seed spread and a saturation point on the BIG
# horizon result. The 5000-step SCST run (suite2 C) reached val CIDEr
# 0.8997 (+0.132 over its XE checkpoint, salt 0) with no saturation at step
# 7500 — which reframes the 1500-step salt sweep (+0.009±0.011) as a
# truncated-horizon artifact: step 4000 sits barely past the systematic
# step-3000 PG dip. This suite:
#   A. repeats the full 5000-step horizon at salts 1 and 2 (spread on +0.132)
#   B. resumes the salt-0 horizon run to step 12500 (where does it saturate?)
set -u
cd /root/repo
PY="python -m vidcap_tpu"
COM="--preset msrvtt_attn_beam5 --batch-size 64 --feature-bank --eval-every 500 --log-every 100 --set data.data_dir=data/scale --set train.scst_xe_mix=0.1 --set train.scst_learning_rate=5e-5"
STATUS=artifacts/r5_suite6_status.log
note () { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

note "=== r5 suite6 (horizon spread + saturation) begin ==="

# ---- A. horizon at salts 1, 2 ----------------------------------------------
for k in 1 2; do
  rm -rf "checkpoints/r5b_hz$k"
  cp -r checkpoints/r5_xe_base "checkpoints/r5b_hz$k"
  note "horizon salt$k start"
  $PY train $COM --stages scst --steps 7500 --resume \
      --set train.attribute_loss_weight=0.2 --set train.rng_salt=$k \
      --checkpoint-dir "checkpoints/r5b_hz$k" \
      --log-file "artifacts/r5_b_hz_salt$k.jsonl" \
      >> artifacts/r5_suite6_stderr.log 2>&1
  note "horizon salt$k done rc=$?"
done

# ---- B. extend salt-0 horizon to 12500 --------------------------------------
note "horizon extend start"
$PY train $COM --stages scst --steps 12500 --resume \
    --set train.attribute_loss_weight=0.2 \
    --checkpoint-dir checkpoints/r5b_horizon \
    --log-file artifacts/r5_b_horizon12k.jsonl \
    >> artifacts/r5_suite6_stderr.log 2>&1
note "horizon extend done rc=$?"

note "=== r5 suite6 end ==="
