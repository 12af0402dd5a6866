#!/bin/bash
# Round-5 recovery suite — the prior session crashed right as suite1 reached
# the attr-OFF control arm (checkpoints/r5_w0.0_s0 is an empty dir; the
# w0.2 arms and all probe work completed and are committed). This script
# finishes the evidence plan end-to-end, serially (ONE remote compile at a
# time; one CPU core):
#
#   0. control-arm XE: attribute_loss_weight=0.0 x 3 matched seeds
#      (the XE-level ablation reads straight from the logged val evals)
#   1. scripts/r5_suite2.sh — everything at the RECOVERED r4 recipe
#      (scst_learning_rate=5e-5): paired SCST ablation, salt sweep,
#      horizon, mixed reward, under-trained-regime lift
#   2. greedy vs beam-5 val quality on an XE-only and an SCST checkpoint
#   3. int8 vocab-projection in-situ A/B (VERDICT r4 next #7)
set -u
cd /root/repo
PY="python -m vidcap_tpu"
DATA="--set data.data_dir=data/scale"
COM="--preset msrvtt_attn_beam5 --batch-size 64 --feature-bank --eval-every 500 --log-every 100 $DATA --set train.scst_xe_mix=0.1"
STATUS=artifacts/r5_suite3_status.log
note () { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

note "=== r5 suite3 begin ==="

# ---- 0. control arm XE (attr head off) ------------------------------------
for s in 0 1 2; do
  rm -rf "checkpoints/r5_w0.0_s$s"
  rm -f "artifacts/r5_ab_w0.0_s$s.jsonl"
  note "xe w0.0_s$s start"
  $PY train $COM --stages xe --steps 2500 \
      --set train.attribute_loss_weight=0.0 --set train.seed=$s \
      --checkpoint-dir "checkpoints/r5_w0.0_s$s" \
      --log-file "artifacts/r5_ab_w0.0_s$s.jsonl" \
      >> artifacts/r5_suite3_stderr.log 2>&1
  note "xe w0.0_s$s done rc=$?"
done

# ---- 1. the recovered-recipe suite ----------------------------------------
bash scripts/r5_suite2.sh

# ---- 2. greedy vs beam-5 val quality at production dims --------------------
val_eval () {  # $1=ckpt_dir $2=method $3=out_tag
  local extra=""
  [ "$2" = beam ] && extra="--beam 5"
  note "val-eval $3 ($2) start"
  $PY caption --preset msrvtt_attn_beam5 $DATA --split val \
      --method "$2" $extra --checkpoint-dir "$1" \
      --out "artifacts/r5_valcaps_$3.json" \
      >> artifacts/r5_suite3_stderr.log 2>&1 \
  && $PY eval --preset msrvtt_attn_beam5 $DATA --split val \
      --captions "artifacts/r5_valcaps_$3.json" \
      > "artifacts/r5_valeval_$3.json" 2>> artifacts/r5_suite3_stderr.log
  note "val-eval $3 done rc=$?"
}
val_eval checkpoints/r5_xe_base     greedy xe_greedy
val_eval checkpoints/r5_xe_base     beam   xe_beam5
val_eval checkpoints/r5b_w0.2_s0    greedy scst_greedy
val_eval checkpoints/r5b_w0.2_s0    beam   scst_beam5

# ---- 3. int8 vocab projection in-situ A/B ----------------------------------
for v in base w8a8 w8bf16; do
  note "int8 $v start"
  python scripts/bench_beam_int8.py "$v" \
      > "artifacts/r5_int8_$v.json" 2>> artifacts/r5_suite3_stderr.log
  note "int8 $v done rc=$?"
done

note "=== r5 suite3 end ==="
