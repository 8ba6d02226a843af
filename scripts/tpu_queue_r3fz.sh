#!/bin/bash
# Round-3 follow-up: frozen-z torso evidence at the kt1 operating point.
#
# The kt1 evidence (runs/rehearsal2_com/temporal_delta_kt1s.json) opened
# the composite temporal gate at r25/s16/k60/kt1 (-0.058 dB vs GT). The
# frozen-z torso variant (fz) should be strictly better positioned:
# delta frames re-evaluate the torso at the KEYFRAME's exact quadrature
# (static pose0 rays keep it valid all cycle) and skip the torso's
# entire per-delta-frame fixed work (inverse-CDF + sort + 450² band
# dilation + cache scatters — the operating-point cost model's FIXED
# term). This probes fz at head s_delta 16 and 12 (the torso freeze
# bought ~1 dB of gate headroom; maybe the head can spend some).
# Re-benches afterwards so BENCH reflects whatever point gates best.
#   nohup setsid bash scripts/tpu_queue_r3fz.sh > /tmp/tpu_fz.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_fz.log
echo "=== fz queue start $(date)" > $LOG

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

# wait for the in-flight bench (never two TPU jobs at once)
if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do
    sleep 60
  done
fi
echo "in-flight bench exited $(date)" >> $LOG

COM=runs/rehearsal2_com
TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"
ev() {  # ev <out_json> <timeout> <args...> — skip if already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json).log" $TD "$@" --out "$out" \
    && [ -s "$out" ] || rm -f "$out"
}

ev $COM/temporal_delta_kt1fz.json 1800 --refresh 25 --frames 50 \
  --s_delta 16 12 --delta_keep 0.6 --delta_keep_torso 0.01 \
  --freeze_z_torso

wait_tpu
run 3600 /tmp/bench_fz.log python bench.py
cp /tmp/bench_fz.log runs/bench_r3fz.log 2>/dev/null

echo "=== fz queue done $(date)" >> $LOG
