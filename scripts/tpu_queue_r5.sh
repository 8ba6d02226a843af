#!/bin/bash
# Round-5 chip queue (phases A-D). Serial TPU jobs; each is
# timeout-bounded and logged. Run: nohup bash scripts/tpu_queue_r5.sh \
#   > /tmp/r5.out 2>&1 &
#
#  A. composite-gate diagnostics on the 225k pair (train split, r10):
#     which lever buys agreement — torso refresh-roll (rt10), frozen
#     torso at short staleness (kt1 at r10), head ceiling (s48 k100).
#  B. held-out DRIVING-clip gating on the 225k pair (the reenactment
#     workload, eval_aud_exp_nerf.py:435-496 semantics): rt + kt1
#     candidates at refresh 25/50. Written into runs/rehearsal2_com so
#     operating-point selection sees them.
#  C. finish the smoothed-audio regime: extend the 225k head in 25k
#     chunks (nosmo 150k) until smoothed val PSNR >= the pre-switch
#     29.46 or 300k steps; then a 20k torso against the final head.
#  D. re-gate on the final pair (driving clip + train-split check) and
#     gate subject2 on ITS driving clip.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_r5.log
echo "=== r5 queue start $(date)" >> $LOG

step_of() {
  ls -d "$1"/step_* 2>/dev/null | sed 's/.*step_0*//' | sort -n | tail -1 \
    | grep . || echo -1
}
tpu_ok() {
  # first jax init through the tunnel can take 3-5 min in this
  # environment — a short probe timeout reads a LIVE chip as down
  timeout 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
assert float(x[0, 0]) == 128.0
" >/dev/null 2>&1
}
wait_tpu() {
  until tpu_ok; do echo "tpu down $(date)" >> $LOG; sleep 180; done
}
run() {
  local t=$1 log=$2; shift 2
  echo ">>> $* ($(date))" >> $LOG
  timeout "$t" "$@" > "$log" 2>&1
  echo "<<< rc=$?" >> $LOG
}

R2=runs/rehearsal2
COM=runs/rehearsal2_com
DRV=runs/rehearsal2_drive
H200=$R2/logs/rehearsal_head200/ckpt
T2B=$COM/logs/rehearsal_head_t2b_torso/ckpt
TD="python scripts/temporal_delta.py --tighten --split train \
  --smooth_audio 1 --head_ckpt $H200 --torso_ckpt $T2B"
PAPER="--N_rand 3072 --N_samples 64 --N_importance 128 --dim_aud 64 \
  --dim_latent 32 --lrate 3e-4 --i_weights 2000 --i_print 200"

# ---------------- A: diagnostics on the 225k pair --------------------
wait_tpu
[ -f $COM/ckpt200/temporal_delta_200k_rt10.json ] || run 1800 /tmp/r5_a1.log $TD --frames 50 --refresh 10 --s_delta 32 \
  --delta_keep 0.8 --dilate_every 2 --roll_k_torso 10 \
  --out $COM/ckpt200/temporal_delta_200k_rt10.json
wait_tpu
[ -f $COM/ckpt200/temporal_delta_200k_kt1r10.json ] || run 1800 /tmp/r5_a2.log $TD --frames 50 --refresh 10 --s_delta 32 \
  --delta_keep 0.8 --delta_keep_torso 0.01 --dilate_every 2 \
  --out $COM/ckpt200/temporal_delta_200k_kt1r10.json
wait_tpu
[ -f $COM/ckpt200/temporal_delta_200k_s48k100.json ] || run 1800 /tmp/r5_a3.log $TD --frames 50 --refresh 10 --s_delta 48 \
  --dilate_every 2 \
  --out $COM/ckpt200/temporal_delta_200k_s48k100.json

# ---------------- B: driving-clip gating on the 225k pair ------------
wait_tpu
[ -f $COM/temporal_delta_drive_rt12.json ] || run 2400 /tmp/r5_b1.log $TD --subject_dir $DRV --frames 60 --refresh 25 \
  --s_delta 32 16 --delta_keep 0.8 --dilate_every 2 --roll_k_torso 12 \
  --out $COM/temporal_delta_drive_rt12.json
wait_tpu
[ -f $COM/temporal_delta_drive_kt1.json ] || run 2400 /tmp/r5_b2.log $TD --subject_dir $DRV --frames 60 --refresh 25 \
  --s_delta 16 --delta_keep 0.6 --delta_keep_torso 0.01 --dilate_every 2 \
  --out $COM/temporal_delta_drive_kt1.json
wait_tpu
[ -f $COM/temporal_delta_drive_r50rt25.json ] || run 2400 /tmp/r5_b3.log $TD --subject_dir $DRV --frames 60 --refresh 50 \
  --s_delta 32 16 --delta_keep 0.8 --dilate_every 2 --roll_k_torso 25 \
  --out $COM/temporal_delta_drive_r50rt25.json

# serve's rolling cadence gets its own vs-GT gate (roll16 = the
# cadence stream_latency/SERVING.md quote), >=3 comb cycles on the
# driving clip — cli/serve --roll_k refuses cadences without this
wait_tpu
[ -f $COM/temporal_delta_drive_roll16.json ] || run 2400 /tmp/r5_b4.log \
  $TD --subject_dir $DRV --frames 60 --refresh 16 \
  --s_delta 16 --delta_keep 0.6 --dilate_every 2 --roll_k 16 \
  --out $COM/temporal_delta_drive_roll16.json

# ---------------- C: finish the smoothed-audio regime ----------------
# Chunked head extension; stop once smoothed val PSNR >= pre-switch
# 29.46 (reference gives the regime 100k+ steps, helper.py:119-122).
TARGET=2946
for i in 1 2 3; do
  STEP=$(step_of $H200)
  [ "$STEP" -ge 300000 ] && break
  VAL=$(python -c "
import json
try: print(int(round(json.load(open('runs/rehearsal200.json'))['full']['psnr']*100)))
except Exception: print(0)")
  [ "$i" -gt 1 ] && [ "$VAL" -ge $TARGET ] && break
  GOAL=$(( STEP + 25000 )); [ $GOAL -gt 300000 ] && GOAL=300000
  until [ "$(step_of $H200)" -ge $(( GOAL - 1000 )) ]; do
    wait_tpu
    S=$(step_of $H200)
    EP=$(( (GOAL - S) / 100 )); [ $EP -lt 1 ] && EP=1
    run 3600 /tmp/r5_train$i.log python -m idealnerf_tpu.cli.train_head \
      --config $R2/HeadNeRF_config.txt --expname rehearsal_head200 \
      --ckpt_dir $H200 --epochs $EP --nosmo_iters 150000 $PAPER
  done
  wait_tpu
  run 2400 /tmp/r5_eval$i.log python scripts/eval200.py
  cp runs/rehearsal200.json runs/rehearsal200_step$(step_of $H200).json
done

# 20k torso against the final head (fresh expname: first torso on the
# converged post-switch regime)
T5=$COM/logs/rehearsal_head_t5_torso
until [ "$(step_of $T5/ckpt)" -ge 19500 ]; do
  wait_tpu
  STEP=$(step_of $T5/ckpt); [ "$STEP" -lt 0 ] && STEP=0
  run 3600 /tmp/r5_torso.log python -m idealnerf_tpu.cli.train_torso \
    --config $COM/HeadNeRF_config.txt --expname rehearsal_head_t5 \
    --head_ckpt $H200 --steps $(( 20000 - STEP )) \
    --nosmo_iters 150000 --smooth_audio 1 $PAPER
done

# ---------------- D: re-gate on the final pair + subject2 ------------
TDF="python scripts/temporal_delta.py --tighten --split train \
  --smooth_audio 1 --head_ckpt $H200 --torso_ckpt $T5/ckpt"
wait_tpu
[ -f $COM/temporal_delta_drive_final_rt12.json ] || run 2400 /tmp/r5_d1.log $TDF --subject_dir $DRV --frames 60 --refresh 25 \
  --s_delta 32 16 --delta_keep 0.8 --dilate_every 2 --roll_k_torso 12 \
  --out $COM/temporal_delta_drive_final_rt12.json
wait_tpu
[ -f $COM/temporal_delta_drive_final_r50rt25.json ] || run 2400 /tmp/r5_d2.log $TDF --subject_dir $DRV --frames 60 --refresh 50 \
  --s_delta 32 16 --delta_keep 0.8 --dilate_every 2 --roll_k_torso 25 \
  --out $COM/temporal_delta_drive_final_r50rt25.json
wait_tpu
[ -f $COM/ckpt200/temporal_delta_final_rt10.json ] || run 1800 /tmp/r5_d3.log $TDF --frames 50 --refresh 10 --s_delta 32 \
  --delta_keep 0.8 --dilate_every 2 --roll_k_torso 10 \
  --out $COM/ckpt200/temporal_delta_final_rt10.json

S2=runs/subject2
S2C=runs/subject2_com
S2D=runs/subject2_drive
TDS="python scripts/temporal_delta.py --tighten --split train \
  --smooth_audio 0 --head_ckpt $S2/logs/rehearsal_head/ckpt \
  --torso_ckpt $S2C/logs/rehearsal_head_torso/ckpt --subject_dir $S2D"
wait_tpu
[ -f $S2C/temporal_delta_drive_rt12.json ] || run 2400 /tmp/r5_d4.log $TDS --frames 60 --refresh 25 --s_delta 32 24 \
  --delta_keep 0.8 --dilate_every 2 --roll_k_torso 12 \
  --out $S2C/temporal_delta_drive_rt12.json

echo "=== r5 queue done $(date)" >> $LOG
