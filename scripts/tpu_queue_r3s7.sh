#!/bin/bash
# Round-3 session-7 follow-up (runs after tpu_queue_r3s6.sh): retry the
# knee-hunt evidence files the s4 queue lost to tunnel-latency timeouts
# (the kt1fzd2lo s10/s8 run measured s10 at -0.69 dB but was killed at
# its 1800s timeout before writing the JSON — tonight's tunnel runs
# ~3-8x slower per dispatch than when those timeouts were sized), then
# refresh the bench log if any knee file landed (the gated selection
# auto-picks a cheaper gated point, raising the composite headline).
#   nohup setsid bash scripts/tpu_queue_r3s7.sh > /tmp/tpu_s7.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_s7.log
echo "=== s7 queue start $(date)" > $LOG

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

# never two TPU jobs at once: wait for the s6 queue
until grep -q "=== s6 queue done" /tmp/tpu_s6.log 2>/dev/null; do
  sleep 120
done
echo "s6 queue done $(date)" >> $LOG

COM=runs/rehearsal2_com
TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"
ev() {  # ev <out_json> <timeout> <args...> — skip if already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json).log" $TD "$@" --out "$out" \
    && [ -s "$out" ] || rm -f "$out"
}

NEW=0
if [ ! -s $COM/temporal_delta_kt1fzd2lo.json ]; then NEW=1; fi
ev $COM/temporal_delta_kt1fzd2lo.json 5400 --refresh 25 --frames 50 \
  --s_delta 10 8 --delta_keep 0.6 --delta_keep_torso 0.01 \
  --freeze_z_torso --dilate_every 2
if [ ! -s $COM/temporal_delta_r50k60d2lo.json ]; then NEW=1; fi
ev $COM/temporal_delta_r50k60d2lo.json 7200 --refresh 50 --frames 100 \
  --s_delta 12 10 --delta_keep 0.6 --dilate_every 2

# knee evidence changes the gated selection -> re-measure the headline
if [ "$NEW" = 1 ]; then
  wait_tpu
  run 3600 /tmp/bench_s7.log python bench.py
  cp /tmp/bench_s7.log runs/bench_s7.log 2>/dev/null
  # and the serving latency at the (possibly new) gated point
  wait_tpu
  run 3600 /tmp/stream_lat_s7.log python scripts/stream_latency.py \
    --frames 100 --mode comp
fi

echo "=== s7 queue done $(date)" >> $LOG
