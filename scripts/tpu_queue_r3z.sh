#!/bin/bash
# Round-3 quality-headroom queue (runs after tpu_queue_r3y.sh):
#   1. train the composite pair's torso from 6k to 30k steps under a
#      SEPARATE expname (rehearsal_head_long_torso) — the committed
#      composite gate evidence describes the 6k torso, which stays
#      untouched (same pattern as the 200k head)
#   2. re-measure the gated composite point on the (100k head, 30k
#      torso) pair into runs/rehearsal2_com/long/ — psnr_full_vs_gt
#      there is the composite-quality headroom number, and the gate
#      reproduction on a stronger torso hardens the temporal claim.
#      The long/ subdir keeps this evidence OUT of bench's gated
#      selection (bench times the default 6k-torso pair).
#   3. if the 200k full-schedule head exists (r3x step 3): measure the
#      head temporal gate on it (head_only modes; default torso)
#   nohup setsid bash scripts/tpu_queue_r3z.sh > /tmp/tpu_z.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_z.log
echo "=== z queue start $(date)" > $LOG

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
  until tpu_ok; do
    echo "tpu down $(date)" >> $LOG
    sleep 180
  done
  echo "tpu healthy $(date)" >> $LOG
}

run() {  # run <timeout_s> <log> <cmd...>
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  local rc=$?
  echo "$* rc=$rc $(date)" >> $LOG
  tail -3 "$log" >> $LOG
  return $rc
}

# never two TPU jobs at once: wait for the y queue
until grep -q "=== y queue done" /tmp/tpu_y.log 2>/dev/null; do
  sleep 120
done
echo "y queue done $(date)" >> $LOG

COM=runs/rehearsal2_com
HEAD=runs/rehearsal2/logs/rehearsal_head/ckpt
T6=$COM/logs/rehearsal_head_torso
T30=$COM/logs/rehearsal_head_long_torso

# 1. long torso under a separate expname (seeded from the 6k ckpt)
if [ ! -d "$T30" ] && [ "$(step_of $T6/ckpt)" -ge 5000 ]; then
  cp -r "$T6" "$T30"
fi
while [ -d "$T30" ] && [ "$(step_of $T30/ckpt)" -lt 29000 ]; do
  wait_tpu
  STEP=$(step_of $T30/ckpt)
  run 3600 /tmp/traintorso_long.log python -m idealnerf_tpu.cli.train_torso \
    --config $COM/HeadNeRF_config.txt --expname rehearsal_head_long \
    --head_ckpt "$HEAD" --steps $(( 30000 - STEP )) \
    --N_rand 3072 --N_samples 64 --N_importance 128 --dim_aud 64 \
    --dim_latent 32 --lrate 3e-4 --i_weights 2000 --i_print 200
done
echo "long torso at step $(step_of $T30/ckpt)" >> $LOG

TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"
ev() {  # ev <out_json> <timeout> <args...> — skip if already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json).log" $TD "$@" --out "$out" \
    && [ -s "$out" ] || rm -f "$out"
}

mkdir -p $COM/long

# 2. gated composite point on the (100k head, 30k torso) pair
if [ "$(step_of $T30/ckpt)" -ge 29000 ]; then
  ev $COM/long/temporal_delta_kt1fzd2.json 1800 --refresh 25 --frames 50 \
    --s_delta 16 12 --delta_keep 0.6 --delta_keep_torso 0.01 \
    --freeze_z_torso --dilate_every 2 --torso_ckpt "$T30/ckpt"
fi

# 3. head temporal gate on the 200k full-schedule head (if trained)
H200=runs/rehearsal2/logs/rehearsal_head200/ckpt
if [ "$(step_of $H200)" -ge 199000 ]; then
  ev $COM/long/temporal_delta_head200.json 2700 --refresh 50 --frames 100 \
    --s_delta 16 12 --delta_keep 0.6 --dilate_every 2 \
    --head_ckpt "$H200"
fi

echo "=== z queue done $(date)" >> $LOG
