#!/bin/bash
# Round-3 session-6 follow-up (runs after tpu_queue_r3s5.sh): measure
# the real-time serving latency of eval/stream.py on the chip at the
# gated composite and head operating points (scripts/stream_latency.py
# -> runs/stream_latency.json + runs/stream_latency_head.json).
#   nohup setsid bash scripts/tpu_queue_r3s6.sh > /tmp/tpu_s6.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_s6.log
echo "=== s6 queue start $(date)" > $LOG

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

# never two TPU jobs at once: wait for the s5 queue
until grep -q "=== s5 queue done" /tmp/tpu_s5.log 2>/dev/null; do
  sleep 120
done
echo "s5 queue done $(date)" >> $LOG

wait_tpu
run 2400 /tmp/stream_lat.log python scripts/stream_latency.py \
  --frames 100 --mode comp
wait_tpu
run 2400 /tmp/stream_lat_head.log python scripts/stream_latency.py \
  --frames 100 --mode head --out runs/stream_latency_head.json

echo "=== s6 queue done $(date)" >> $LOG
