#!/bin/bash
# Round-5 evidence suite (VERDICT r4 next #1–#4): all runs go through the
# public CLI at the at-scale banked config (5k videos, vocab 16k, B=64,
# T=26, D=1536 — scripts/make_scale_corpus.py --out data/scale).
#
#   1. multitask ablation: attribute_loss_weight 0.2 vs 0.0, 3 matched seeds,
#      full staged xe(2500)->scst(1500) each            (VERDICT #1)
#   2. SCST seed sweep: 4 rng_salt arms off ONE frozen XE checkpoint
#      + a 5000-step horizon run                         (VERDICT #2)
#   3. mixed CIDEr+BLEU reward training run              (VERDICT #3)
#   4. greedy vs beam-5 val quality on the trained ckpts (VERDICT #4)
#
# Serial by construction: this environment allows ONE remote compile at a
# time, and the host has one CPU core. Every run appends a line to
# artifacts/r5_suite_status.log so progress is observable from outside.
set -u
cd /root/repo
PY="python -m vidcap_tpu"
DATA="--set data.data_dir=data/scale"
COM="--preset msrvtt_attn_beam5 --batch-size 64 --feature-bank --eval-every 500 --log-every 100 $DATA --set train.scst_xe_mix=0.1"
STATUS=artifacts/r5_suite_status.log
mkdir -p artifacts checkpoints
note () { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

run_xe () {  # $1=attr_w $2=seed
  local tag="w$1_s$2"
  note "xe $tag start"
  $PY train $COM --stages xe --steps 2500 \
      --set train.attribute_loss_weight=$1 --set train.seed=$2 \
      --checkpoint-dir checkpoints/r5_$tag \
      --log-file artifacts/r5_ab_$tag.jsonl \
      >> artifacts/r5_suite_stderr.log 2>&1
  note "xe $tag done rc=$?"
}

run_scst () {  # $1=attr_w $2=seed  (continues in the same dir)
  local tag="w$1_s$2"
  note "scst $tag start"
  $PY train $COM --stages scst --steps 4000 --resume \
      --set train.attribute_loss_weight=$1 --set train.seed=$2 \
      --checkpoint-dir checkpoints/r5_$tag \
      --log-file artifacts/r5_ab_$tag.jsonl \
      >> artifacts/r5_suite_stderr.log 2>&1
  note "scst $tag done rc=$?"
}

# off the frozen seed-0 attr-0.2 XE checkpoint (snapshot taken below)
run_scst_variant () {  # $1=name $2=steps $3...=extra --set flags
  local name=$1 steps=$2; shift 2
  note "scst-variant $name start"
  rm -rf "checkpoints/r5_var_$name"
  cp -r checkpoints/r5_xe_base "checkpoints/r5_var_$name"
  $PY train $COM --stages scst --steps "$steps" --resume \
      --set train.attribute_loss_weight=0.2 --set train.seed=0 "$@" \
      --checkpoint-dir "checkpoints/r5_var_$name" \
      --log-file "artifacts/r5_var_$name.jsonl" \
      >> artifacts/r5_suite_stderr.log 2>&1
  note "scst-variant $name done rc=$?"
}

val_eval () {  # $1=ckpt_dir $2=method $3=out_tag
  local extra=""
  [ "$2" = beam ] && extra="--beam 5"
  note "val-eval $3 ($2) start"
  $PY caption --preset msrvtt_attn_beam5 $DATA --split val \
      --method "$2" $extra --checkpoint-dir "$1" \
      --out "artifacts/r5_valcaps_$3.json" \
      >> artifacts/r5_suite_stderr.log 2>&1 \
  && $PY eval --preset msrvtt_attn_beam5 $DATA --split val \
      --captions "artifacts/r5_valcaps_$3.json" \
      > "artifacts/r5_valeval_$3.json" 2>> artifacts/r5_suite_stderr.log
  note "val-eval $3 done rc=$?"
}

note "=== r5 suite begin ==="

# ---- 1. seed-0 attr arm first (compiles the shared graphs), snapshot XE ----
run_xe 0.2 0
rm -rf checkpoints/r5_xe_base && cp -r checkpoints/r5_w0.2_s0 checkpoints/r5_xe_base
run_scst 0.2 0

# ---- 2. remaining attr-0.2 seeds (warm graphs) ----
for s in 1 2; do run_xe 0.2 $s; run_scst 0.2 $s; done

# ---- 3. control arm: attribute head OFF (one cold XE + one cold SCST) ----
for s in 0 1 2; do run_xe 0.0 $s; run_scst 0.0 $s; done

# ---- 4. SCST seed sweep off the frozen XE ckpt (rng_salt decorrelates) ----
for k in 1 2 3; do
  run_scst_variant "salt$k" 4000 --set train.rng_salt=$k
done

# ---- 5. horizon: 5000 SCST steps (saturation check) ----
run_scst_variant "horizon5k" 7500

# ---- 6. mixed CIDEr+BLEU reward (cold SCST graph) ----
run_scst_variant "mixed" 4000 \
    --set train.scst_reward=cider_bleu --set train.bleu_mix=0.3

# ---- 7. greedy vs beam-5 val quality at production dims ----
val_eval checkpoints/r5_w0.2_s0 greedy w02_s0_greedy
val_eval checkpoints/r5_w0.2_s0 beam   w02_s0_beam5
val_eval checkpoints/r5_w0.0_s0 greedy w00_s0_greedy
val_eval checkpoints/r5_w0.0_s0 beam   w00_s0_beam5

note "=== r5 suite end ==="
