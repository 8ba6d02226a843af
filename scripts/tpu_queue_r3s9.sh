#!/bin/bash
# Round-3 session-9 orchestrator. The machine was rebooted again: every
# gitignored artifact (exported subjects, checkpoints) is gone, the s7/s8
# retry queues never ran (their /tmp logs were wiped with the box), and
# their artifacts never landed. This queue is SELF-CONTAINED — it waits
# on nothing but the TPU itself — and re-runs the complete s4 flow with
# the s8-generation generous timeouts (the tunnel has run 3-8x slower
# than the original sizing on bad nights):
#
#   0. re-make the synthetic subjects (CPU; idempotent)
#   A. rebuild the 100k head checkpoint (resumes from newest step)
#   B. rebuild the composite subject + 6k torso
#   C. knee hunts: composite s10/s8 at the torso-frozen dilate_every=2
#      point; head refresh-50 s12/s10 at k60+d2
#   D. full 200k-step reference-schedule head + val render
#      -> runs/rehearsal200.json
#   E. torso 6k -> 30k, gated composite point re-measured on the
#      (100k head, 30k torso) pair -> runs/rehearsal2_com/long/,
#      head temporal gate on the 200k head
#   F. re-eval the rebuilt 100k ckpt + refresh the bench log
#
# Every step is idempotent and skipped when its artifact exists.
#   nohup setsid bash scripts/tpu_queue_r3s9.sh > /tmp/tpu_s9.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_s9.log
echo "=== s9 queue start $(date)" > $LOG

step_of() {
  ls -d "$1"/step_* 2>/dev/null | sed 's/.*step_0*//' | sort -n | tail -1 \
    | grep . || echo -1
}

tpu_ok() {  # fetch forces execution: block_until_ready lies through
            # the axon tunnel (BASELINE.md)
  timeout 180 python -c "
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

HEAD=runs/rehearsal2/logs/rehearsal_head/ckpt
COM=runs/rehearsal2_com
TORSO=$COM/logs/rehearsal_head_torso/ckpt
PAPER="--N_rand 3072 --N_samples 64 --N_importance 128 --dim_aud 64 \
  --dim_latent 32 --mouth_rays 512 --torso_rays 512 --lrate 3e-4 \
  --lc_weight 0.005 --i_weights 2000 --i_print 200"

# 0. subjects on disk (deterministic seed 7 => same subject as the
# committed evidence describes; CPU-only keeps the exporter off the
# tunnel)
if [ ! -f runs/rehearsal2/HeadNeRF_config.txt ]; then
  run 2400 /tmp/make2.log env JAX_PLATFORMS=cpu python scripts/rehearsal.py \
    --out runs/rehearsal2 --phase make
fi
if [ ! -f $COM/HeadNeRF_config.txt ]; then
  run 2400 /tmp/makecom.log env JAX_PLATFORMS=cpu python scripts/rehearsal.py \
    --out $COM --phase make --with_torso
fi

# a torso checkpoint trained against a partial head must not survive
if [ "$(step_of $HEAD)" -lt 99000 ] && [ "$(step_of $TORSO)" -ge 0 ]; then
  echo "discarding torso ckpt trained against partial head" >> $LOG
  rm -rf "$TORSO"
fi

# A. head to 100k (--epochs are ADDITIONAL after resume; train split is
# 100 frames => ~100 steps/epoch)
until [ "$(step_of $HEAD)" -ge 99000 ]; do
  wait_tpu
  STEP=$(step_of $HEAD); [ "$STEP" -lt 0 ] && STEP=0
  run 14400 /tmp/train2.log python scripts/rehearsal.py \
    --out runs/rehearsal2 --phase train \
    --epochs $(( (100000 - STEP) / 100 + 1 ))
done
echo "head complete: step $(step_of $HEAD)" >> $LOG

# B. torso to 6k (--steps = ADDITIONAL steps from the resumed step)
until [ "$(step_of $TORSO)" -ge 5000 ]; do
  wait_tpu
  STEP=$(step_of $TORSO); [ "$STEP" -lt 0 ] && STEP=0
  run 4800 /tmp/traintorso.log python -m idealnerf_tpu.cli.train_torso \
    --config $COM/HeadNeRF_config.txt \
    --head_ckpt "$HEAD" --steps $(( 6000 - STEP )) \
    --N_rand 3072 --N_samples 64 --N_importance 128 --dim_aud 64 \
    --dim_latent 32 --lrate 3e-4 --i_weights 2000 --i_print 200
done
echo "torso complete: step $(step_of $TORSO)" >> $LOG

TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"
ev() {  # ev <out_json> <timeout> <args...> — skip if already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json).log" $TD "$@" --out "$out" \
    && [ -s "$out" ] || rm -f "$out"
}

# C. knee hunts (may raise the gated composite headline past 40 fps)
ev $COM/temporal_delta_kt1fzd2lo.json 5400 --refresh 25 --frames 50 \
  --s_delta 10 8 --delta_keep 0.6 --delta_keep_torso 0.01 \
  --freeze_z_torso --dilate_every 2
ev $COM/temporal_delta_r50k60d2lo.json 7200 --refresh 50 --frames 100 \
  --s_delta 12 10 --delta_keep 0.6 --dilate_every 2

# D. reference full schedule: continue the 100k head to 200k under a
# separate expname, then val-render it
H100=runs/rehearsal2/logs/rehearsal_head
H200=runs/rehearsal2/logs/rehearsal_head200
if [ ! -d "$H200" ] && [ "$(step_of $H100/ckpt)" -ge 99000 ]; then
  cp -r "$H100" "$H200"
fi
while [ -d "$H200" ] && [ "$(step_of $H200/ckpt)" -lt 199000 ]; do
  wait_tpu
  STEP=$(step_of $H200/ckpt)
  EP=$(( (200000 - STEP) / 110 + 1 ))
  run 14400 /tmp/train200.log python -m idealnerf_tpu.cli.train_head \
    --config runs/rehearsal2/HeadNeRF_config.txt \
    --expname rehearsal_head200 $PAPER --epochs $EP
done
echo "head200 at step $(step_of $H200/ckpt)" >> $LOG

if [ "$(step_of $H200/ckpt)" -ge 199000 ] \
    && [ ! -s runs/rehearsal200.json ]; then
  wait_tpu
  run 10800 /tmp/eval200.log python scripts/eval200.py
fi

# E. 30k torso + headroom evidence on the stronger pair
T30=$COM/logs/rehearsal_head_long_torso
if [ ! -d "$T30" ] && [ "$(step_of $TORSO)" -ge 5000 ]; then
  cp -r "$(dirname $TORSO)" "$T30"
fi
while [ -d "$T30" ] && [ "$(step_of $T30/ckpt)" -lt 29000 ]; do
  wait_tpu
  STEP=$(step_of $T30/ckpt); [ "$STEP" -lt 0 ] && STEP=0
  run 7200 /tmp/traintorso_long.log python -m idealnerf_tpu.cli.train_torso \
    --config $COM/HeadNeRF_config.txt --expname rehearsal_head_long \
    --head_ckpt "$HEAD" --steps $(( 30000 - STEP )) \
    --N_rand 3072 --N_samples 64 --N_importance 128 --dim_aud 64 \
    --dim_latent 32 --lrate 3e-4 --i_weights 2000 --i_print 200
done
echo "long torso at step $(step_of $T30/ckpt)" >> $LOG

mkdir -p $COM/long
if [ "$(step_of $T30/ckpt)" -ge 29000 ]; then
  ev $COM/long/temporal_delta_kt1fzd2.json 5400 --refresh 25 --frames 50 \
    --s_delta 16 12 --delta_keep 0.6 --delta_keep_torso 0.01 \
    --freeze_z_torso --dilate_every 2 --torso_ckpt "$T30/ckpt"
fi
if [ "$(step_of $H200/ckpt)" -ge 199000 ]; then
  ev $COM/long/temporal_delta_head200.json 7200 --refresh 50 --frames 100 \
    --s_delta 16 12 --delta_keep 0.6 --dilate_every 2 \
    --head_ckpt "$H200/ckpt"
fi

# F. re-eval the rebuilt 100k checkpoint + refresh the bench log
if [ ! -s runs/rehearsal2/results_s4.json ]; then
  wait_tpu
  run 10800 /tmp/reval.log python scripts/rehearsal.py \
    --out runs/rehearsal2 --phase eval \
    && cp runs/rehearsal2/results.json runs/rehearsal2/results_s4.json
fi
wait_tpu
run 7200 /tmp/bench_s9.log python bench.py
cp /tmp/bench_s9.log runs/bench_s9.log 2>/dev/null

echo "=== s9 queue done $(date)" >> $LOG
