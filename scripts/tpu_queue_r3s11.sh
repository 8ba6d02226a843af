#!/bin/bash
# Round-3 session-11 follow-up: rolling-keyframe-refresh serving
# evidence (eval/stream.py roll_k — spreads the keyframe's cost over
# the comb so no push ever pays a keyframe spike). Waits for the s10
# serving-latency queue, then measures a roll_k ladder on the rebuilt
# checkpoints: per-push latency percentiles + 40 ms deadline hit rate
# + agreement dB vs a refresh=1 per-frame-full-render anchor.
# Launch: nohup setsid bash scripts/tpu_queue_r3s11.sh > /tmp/tpu_s11.out 2>&1 &
#         (then write the REAL queue pid into /tmp/s11.pid: the setsid
#          wrapper exits immediately — use ps to find the bash pid)
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_s11.log
echo "=== s11 queue start $(date)" > $LOG

S10=$(cat /tmp/s10.pid 2>/dev/null)
while [ -n "$S10" ] && kill -0 "$S10" 2>/dev/null; do
  sleep 120
done
echo "s10 done $(date)" >> $LOG

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

ev() {  # ev <out_json> <timeout> <args...> — skip when already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json).log" \
    python scripts/stream_latency.py "$@" --out "$out"
  [ -s "$out" ] || rm -f "$out"
}

# composite roll ladder: K=16 is the headline (0.64 s refresh age,
# delta + kf/16 per frame); 8 and 32 bracket the latency/quality knee
ev runs/stream_latency_roll16.json 5400 --mode comp --roll_k 16 \
  --frames 100 --quality 40
ev runs/stream_latency_roll8.json 5400 --mode comp --roll_k 8 \
  --frames 100 --quality 40
ev runs/stream_latency_roll32.json 5400 --mode comp --roll_k 32 \
  --frames 100 --quality 40
ev runs/stream_latency_roll_head16.json 5400 --mode head --roll_k 16 \
  --frames 100 --quality 40

echo "=== s11 queue done $(date)" >> $LOG
