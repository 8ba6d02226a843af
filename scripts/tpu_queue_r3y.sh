#!/bin/bash
# Round-3 probe queue (runs after tpu_queue_r3x.sh): push the gated
# operating points past the already-PASSED north star, exploiting the
# measured dilate_every=2 quality WIN (temporal_delta_kt1fzd2.json:
# thinning the spatial band dilation keeps the depth bands tight, so
# composite s16 improves -0.116 -> -0.755 dB vs GT and s12 goes from
# FAILING at 0.52 to GATING at -0.396; head-only agreement 45.1 -> 49.6
# dB at s16).
#   1. composite s10 / s8 at the torso-frozen d2 point (r25/k60/kt1/fz/
#      d2): s12 gates with 0.45 dB of margin — find the knee
#   2. head refresh-50 s12 / s10 at k60+d2: r50 s16 (no d2) measures
#      42.6 dB vs the >=40 dB gate and d2 buys ~4 dB at r25 — the
#      cheaper rungs are in reach (r3x already measures r50 s16 d2)
#   3. re-bench so the gated selection picks up whatever passed
#   nohup setsid bash scripts/tpu_queue_r3y.sh > /tmp/tpu_y.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_y.log
echo "=== y queue start $(date)" > $LOG

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

# never two TPU jobs at once: wait for the x queue
until grep -q "=== x queue done" /tmp/tpu_x.log 2>/dev/null; do
  sleep 120
done
echo "x queue done $(date)" >> $LOG

run() {  # run <timeout_s> <log> <cmd...>
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  local rc=$?
  echo "$* rc=$rc $(date)" >> $LOG
  tail -3 "$log" >> $LOG
  return $rc
}

COM=runs/rehearsal2_com
TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"
ev() {  # ev <out_json> <timeout> <args...> — skip if already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json).log" $TD "$@" --out "$out" \
    && [ -s "$out" ] || rm -f "$out"
}

# 1. composite knee hunt below s12 at the d2 torso-frozen point
ev $COM/temporal_delta_kt1fzd2lo.json 1800 --refresh 25 --frames 50 \
  --s_delta 10 8 --delta_keep 0.6 --delta_keep_torso 0.01 \
  --freeze_z_torso --dilate_every 2

# 2. head refresh-50 ladder s12/s10 with d2 (head gate reads the
# head_only_* modes; the composite modes from the same run are extra
# dose-response points)
ev $COM/temporal_delta_r50k60d2lo.json 2700 --refresh 50 --frames 100 \
  --s_delta 12 10 --delta_keep 0.6 --dilate_every 2

# 3. re-bench with whatever new evidence gates
wait_tpu
run 3600 /tmp/bench_y.log python bench.py

echo "=== y queue done $(date)" >> $LOG
