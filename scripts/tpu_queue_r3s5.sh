#!/bin/bash
# Round-3 session-4 follow-up (runs after tpu_queue_r3s4.sh): re-measure
# the delta-frame cost model with the fused delta kernel
# (kernels.fused_render_delta — in-kernel depth placement + band), which
# the s4 queue's evidence/bench already run implicitly; this records the
# saving explicitly (end_to_end_ms_xla_delta vs end_to_end_ms) and the
# new fixed/slope split, then refreshes the bench log.
#   nohup setsid bash scripts/tpu_queue_r3s5.sh > /tmp/tpu_s5.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_s5.log
echo "=== s5 queue start $(date)" > $LOG

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

# never two TPU jobs at once: wait for the s4 queue
until grep -q "=== s4 queue done" /tmp/tpu_s4.log 2>/dev/null; do
  sleep 120
done
echo "s4 queue done $(date)" >> $LOG

wait_tpu
run 2400 /tmp/tprof_s5.log python scripts/temporal_profile.py --reps 20
wait_tpu
run 3600 /tmp/bench_s5.log python bench.py
cp /tmp/bench_s5.log runs/bench_s5.log 2>/dev/null

echo "=== s5 queue done $(date)" >> $LOG
