#!/bin/bash
# Round-4 follow-up queue. Context: a stale round-3 orchestrator that
# survived into this session trained rehearsal_head200 to 199200 steps
# WITHOUT --nosmo_iters (default 300000), so the AudAttNet switch was
# never crossed — the smoothed-audio regime is still untrained, and the
# r4 orchestrator's smoothing-dependent stages (torso200 --smooth_audio,
# temporal_delta_200k --smooth_audio) ran against a random AudAttNet.
# This queue, after the main r4 orchestrator exits:
#   1. extends head200 +25k steps with nosmo_iters=150000 (the switch
#      activates immediately at resume; reference anchor:
#      helper.py:119-122, switch at 300k of the full schedule)
#   2. re-checks aud_att movement (must now move)
#   3. retrains torso200 against the post-switch head (fresh expname —
#      the first torso200 conditioned on random-AudAttNet features)
#   4. re-measures eval200 + the 200k temporal gate with smoothing
#   5. retrains the FAN proxy with the round-4 forward-magnitude
#      calibration (the first proxy diverged: heatmap MSE 1e26) and
#      re-runs the landmark ablation row against it
#   6. re-runs bench
# Usage: nohup bash scripts/tpu_queue_r4b.sh <wait_pid> > /tmp/r4b.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_r4b.log
echo "=== r4b start $(date), waiting on pid $1" >> $LOG
while [ -n "$1" ] && kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "=== main orchestrator done $(date)" >> $LOG

step_of() {
  ls -d "$1"/step_* 2>/dev/null | sed 's/.*step_0*//' | sort -n | tail -1 \
    | grep . || echo -1
}
tpu_ok() {
  timeout 120 python -c "
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
H200=$R2/logs/rehearsal_head200
PAPER="--N_rand 3072 --N_samples 64 --N_importance 128 --dim_aud 64 \
  --dim_latent 32 --lrate 3e-4 --i_weights 2000 --i_print 200"

# 1. +25k post-switch steps
until [ "$(step_of $H200/ckpt)" -ge 224000 ]; do
  wait_tpu
  STEP=$(step_of $H200/ckpt)
  EP=$(( (225000 - STEP) / 100 )); [ $EP -lt 1 ] && EP=1
  run 3600 /tmp/r4b_train.log python -m idealnerf_tpu.cli.train_head \
    --config $R2/HeadNeRF_config.txt --expname rehearsal_head200 \
    --ckpt_dir $H200/ckpt --epochs $EP --nosmo_iters 150000 $PAPER
done

# 2. aud_att must move now
wait_tpu
run 900 /tmp/r4b_aam.log python scripts/check_audatt_moved.py

# 3. torso against the post-switch head (train_torso appends "_torso"
# to the expname — watch the REAL ckpt dir)
T200B=$COM/logs/rehearsal_head_t2b_torso
until [ "$(step_of $T200B/ckpt)" -ge 5900 ]; do
  wait_tpu
  STEP=$(step_of $T200B/ckpt); [ "$STEP" -lt 0 ] && STEP=0
  run 2400 /tmp/r4b_torso.log python -m idealnerf_tpu.cli.train_torso \
    --config $COM/HeadNeRF_config.txt --expname rehearsal_head_t2b \
    --head_ckpt $H200/ckpt --steps $(( 6000 - STEP )) \
    --nosmo_iters 150000 --smooth_audio 1 $PAPER
done

# 4. 200k quality + gates, smoothing consistent with training
wait_tpu
run 2400 /tmp/r4b_e200.log python scripts/eval200.py
mkdir -p $COM/ckpt200
wait_tpu
run 3000 /tmp/r4b_td200.log python scripts/temporal_delta.py \
  --frames 50 --refresh 25 --s_delta 16 --samples 16 --importance 32 \
  --delta_keep 0.6 --delta_keep_torso 0.01 --tighten --split train \
  --smooth_audio 1 --head_ckpt $H200/ckpt --torso_ckpt $T200B/ckpt \
  --out $COM/ckpt200/temporal_delta_200k.json

# 5. calibrated FAN proxy + landmark ablation row
wait_tpu
run 2400 /tmp/r4b_fan.log python scripts/train_fan_proxy.py \
  --steps 600 --out $R2
wait_tpu
run 4800 /tmp/r4b_abl.log python scripts/rehearsal_2nd.py \
  --ablate --steps 400 --out $R2

# 6. bench
wait_tpu
run 2400 /tmp/r4b_bench.log python bench.py
grep '^{' /tmp/r4b_bench.log | tail -1 > runs/bench_r4.json
echo "=== r4b done $(date)" >> $LOG
