#!/bin/bash
# Round-5 follow-up suite — the r4 SCST recipe RECOVERED (scst_learning_rate
# = 5e-5, the scst_cider preset value): a 100-step fingerprint probe at 5e-5
# reproduces r4's step-2600 SCST row bit-for-bit (all 17 digits —
# artifacts/r5_probe_lr5e-5.jsonl vs scale_run_r4_banked_train_log.jsonl),
# while 1e-6/2.5e-6/1e-5 and the default lr/20 all diverge. The LR sits in
# the jitted optax graph as a constant, which is also why r5's default-LR
# SCST stage cold-compiled instead of hitting r4's cache.
#
# Everything here runs at the recovered recipe:
#   A. ablation SCST reruns: attr 0.2 vs 0.0 × 3 matched seeds, SCST@5e-5
#      off each arm's frozen XE step-2500 checkpoint  (VERDICT #1 at the
#      recipe that actually lifts)
#   B. SCST seed sweep: rng_salt 1..3 off the seed-0 attr-0.2 XE ckpt
#      (+ the A rerun as salt 0) → mean ± spread of the r4 +0.016 claim
#   C. horizon: 5000 SCST steps (saturation + is the mid-stage dip a dip?)
#   D. mixed CIDEr+BLEU reward at 5e-5              (VERDICT #3)
#   E. SCST off the UNDER-TRAINED step-1000 ckpt (val CIDEr 0.32), 3 salts —
#      the regime with RL headroom                   (VERDICT #2)
set -u
cd /root/repo
PY="python -m vidcap_tpu"
COM="--preset msrvtt_attn_beam5 --batch-size 64 --feature-bank --eval-every 500 --log-every 100 --set data.data_dir=data/scale --set train.scst_xe_mix=0.1 --set train.scst_learning_rate=5e-5"
STATUS=artifacts/r5_suite2_status.log
note () { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

snap_xe () {  # $1=arm dir  $2=dest  $3=keep_step  — XE-only snapshot
  rm -rf "$2"
  cp -r "$1" "$2"
  for d in "$2"/*/; do
    b=$(basename "$d")
    [ "$b" != "$3" ] && rm -rf "$d"
  done
}

scst_run () {  # $1=ckpt_dir $2=log_tag $3=total_steps $4=attr_w extra...
  local ck=$1 tag=$2 steps=$3 w=$4; shift 4
  note "scst $tag start"
  $PY train $COM --stages scst --steps "$steps" --resume \
      --set train.attribute_loss_weight=$w "$@" \
      --checkpoint-dir "$ck" \
      --log-file "artifacts/r5_$tag.jsonl" \
      >> artifacts/r5_suite2_stderr.log 2>&1
  note "scst $tag done rc=$?"
}

note "=== r5 suite2 begin (recipe: scst lr 5e-5) ==="

# ---- A. ablation SCST@5e-5 reruns off each arm's XE-2500 ----
for w in 0.2 0.0; do
  for s in 0 1 2; do
    snap_xe "checkpoints/r5_w${w}_s${s}" "checkpoints/r5b_w${w}_s${s}" 2500
    scst_run "checkpoints/r5b_w${w}_s${s}" "b_w${w}_s${s}" 4000 "$w"
  done
done

# ---- B. seed sweep (salts) off the seed-0 attr-0.2 XE ckpt ----
# (r5_xe_base is the post-XE snapshot: steps 1000/2000/2500, latest = 2500)
for k in 1 2 3; do
  rm -rf "checkpoints/r5b_salt$k"
  cp -r checkpoints/r5_xe_base "checkpoints/r5b_salt$k"
  scst_run "checkpoints/r5b_salt$k" "b_salt$k" 4000 0.2 \
      --set train.rng_salt=$k
done

# ---- C. horizon: 5000 SCST steps ----
rm -rf checkpoints/r5b_horizon
cp -r checkpoints/r5_xe_base checkpoints/r5b_horizon
scst_run checkpoints/r5b_horizon b_horizon5k 7500 0.2

# ---- D. mixed CIDEr+BLEU reward ----
rm -rf checkpoints/r5b_mixed
cp -r checkpoints/r5_xe_base checkpoints/r5b_mixed
scst_run checkpoints/r5b_mixed b_mixed 4000 0.2 \
    --set train.scst_reward=cider_bleu --set train.bleu_mix=0.3

# ---- E. under-trained lift (XE step-1000, val CIDEr ~0.32), 3 salts ----
# (step 1000 survives only in the r5_xe_base snapshot — the arm dirs pruned
# it via max_to_keep)
for k in 0 1 2; do
  snap_xe checkpoints/r5_xe_base "checkpoints/r5b_ut$k" 1000
  scst_run "checkpoints/r5b_ut$k" "b_ut$k" 2500 0.2 \
      --set train.rng_salt=$k
done

note "=== r5 suite2 end ==="
