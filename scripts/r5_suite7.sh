#!/bin/bash
# Round-5 suite 7 — finish the horizon story and put the repo's best quality
# number on record.
#
#   A. extend the salt-0 horizon run 12.5k -> 20k SCST steps: the 12.5k curve
#      is still rising (best 1.016 @ 12k); find the plateau (or show 20k is
#      still climbing — either answer closes "where does it saturate?").
#   B. greedy + beam-5 val eval of the final horizon checkpoint — the best
#      decode on the best policy = the framework's headline quality number
#      at production dims.
set -u
cd /root/repo
PY="python -m vidcap_tpu"
DATA="--set data.data_dir=data/scale"
COM="--preset msrvtt_attn_beam5 --batch-size 64 --feature-bank --eval-every 500 --log-every 100 $DATA --set train.scst_xe_mix=0.1 --set train.scst_learning_rate=5e-5"
STATUS=artifacts/r5_suite7_status.log
note () { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

note "=== r5 suite7 (horizon saturation + best-ckpt quality) begin ==="

# ---- A. extend salt-0 horizon to 20000 --------------------------------------
note "horizon extend-20k start"
$PY train $COM --stages scst --steps 20000 --resume \
    --set train.attribute_loss_weight=0.2 \
    --checkpoint-dir checkpoints/r5b_horizon \
    --log-file artifacts/r5_b_horizon20k.jsonl \
    >> artifacts/r5_suite7_stderr.log 2>&1
note "horizon extend-20k done rc=$?"

# ---- B. val quality of the final horizon checkpoint -------------------------
val_eval () {  # $1=ckpt_dir $2=method $3=out_tag
  local extra=""
  [ "$2" = beam ] && extra="--beam 5"
  note "val-eval $3 ($2) start"
  $PY caption --preset msrvtt_attn_beam5 $DATA --split val \
      --method "$2" $extra --checkpoint-dir "$1" \
      --out "artifacts/r5_valcaps_$3.json" \
      >> artifacts/r5_suite7_stderr.log 2>&1 \
  && $PY eval --preset msrvtt_attn_beam5 $DATA --split val \
      --captions "artifacts/r5_valcaps_$3.json" \
      > "artifacts/r5_valeval_$3.json" 2>> artifacts/r5_suite7_stderr.log
  note "val-eval $3 done rc=$?"
}
val_eval checkpoints/r5b_horizon greedy hz20k_greedy
val_eval checkpoints/r5b_horizon beam   hz20k_beam5

note "=== r5 suite7 end ==="
