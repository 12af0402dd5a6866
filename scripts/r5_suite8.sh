#!/bin/bash
# Round-5 suite 8 — last horizon extension: 20k -> 30k SCST steps. The 20k
# curve is still climbing (1.226 @ 20k, best 1.231 @ 19k, slope decaying);
# either a plateau appears by 30k or "not saturated at 30k" is the recorded
# answer. Then the final checkpoint gets the same greedy+beam-5 val eval.
set -u
cd /root/repo
PY="python -m vidcap_tpu"
DATA="--set data.data_dir=data/scale"
COM="--preset msrvtt_attn_beam5 --batch-size 64 --feature-bank --eval-every 500 --log-every 100 $DATA --set train.scst_xe_mix=0.1 --set train.scst_learning_rate=5e-5"
STATUS=artifacts/r5_suite8_status.log
note () { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

note "=== r5 suite8 (horizon 20k->30k) begin ==="

note "horizon extend-30k start"
$PY train $COM --stages scst --steps 30000 --resume \
    --set train.attribute_loss_weight=0.2 \
    --checkpoint-dir checkpoints/r5b_horizon \
    --log-file artifacts/r5_b_horizon30k.jsonl \
    >> artifacts/r5_suite8_stderr.log 2>&1
note "horizon extend-30k done rc=$?"

val_eval () {  # $1=ckpt_dir $2=method $3=out_tag
  local extra=""
  [ "$2" = beam ] && extra="--beam 5"
  note "val-eval $3 ($2) start"
  $PY caption --preset msrvtt_attn_beam5 $DATA --split val \
      --method "$2" $extra --checkpoint-dir "$1" \
      --out "artifacts/r5_valcaps_$3.json" \
      >> artifacts/r5_suite8_stderr.log 2>&1 \
  && $PY eval --preset msrvtt_attn_beam5 $DATA --split val \
      --captions "artifacts/r5_valcaps_$3.json" \
      > "artifacts/r5_valeval_$3.json" 2>> artifacts/r5_suite8_stderr.log
  note "val-eval $3 done rc=$?"
}
val_eval checkpoints/r5b_horizon greedy hz30k_greedy
val_eval checkpoints/r5b_horizon beam   hz30k_beam5

note "=== r5 suite8 end ==="
