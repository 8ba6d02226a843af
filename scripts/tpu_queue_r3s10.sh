#!/bin/bash
# Round-3 session-10 follow-up: artifacts NOT covered by the s9 rebuild.
# Waits for the s9 queue to exit (it owns the TPU until then), then:
#   1. serving latency, composite + head-only (runs/stream_latency*.json
#      were lost to the machine reboot; SERVING.md summarizes them in
#      BASELINE.md) — needs the rebuilt head + 6k torso checkpoints.
# Launch: nohup setsid bash scripts/tpu_queue_r3s10.sh > /tmp/tpu_s10.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_s10.log
echo "=== s10 queue start $(date)" > $LOG

# wait for s9 (pid recorded at its launch) to release the device
S9=$(cat /tmp/s9.pid 2>/dev/null)
while [ -n "$S9" ] && kill -0 "$S9" 2>/dev/null; do
  sleep 120
done
echo "s9 done $(date)" >> $LOG

tpu_ok() {
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
  echo "$* rc=$? $(date)" >> $LOG
  tail -3 "$log" >> $LOG
}

if [ ! -s runs/stream_latency.json ]; then
  wait_tpu
  run 5400 /tmp/stream_comp.log python scripts/stream_latency.py \
    --mode comp --frames 100
fi
if [ ! -s runs/stream_latency_head.json ]; then
  wait_tpu
  run 5400 /tmp/stream_head.log python scripts/stream_latency.py \
    --mode head --frames 100 --out runs/stream_latency_head.json
fi

echo "=== s10 queue done $(date)" >> $LOG
