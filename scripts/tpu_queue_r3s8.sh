#!/bin/bash
# Round-3 session-8 backstop (runs after tpu_queue_r3s7.sh): the s4
# orchestrator's stage-E/F artifacts use timeouts sized for a fast
# tunnel (1800-3600s), and tonight's tunnel runs 3-8x slower — any of
# them may rc=124 and be lost the same way the stage-C knee files were
# (which s7 retries). This queue re-attempts, with generous timeouts,
# every s4 artifact that is still missing once s7 finishes, then
# refreshes the bench log if anything landed:
#   - runs/rehearsal200.json            (200k full-schedule val anchor)
#   - runs/rehearsal2_com/long/temporal_delta_kt1fzd2.json   (30k torso)
#   - runs/rehearsal2_com/long/temporal_delta_head200.json   (200k head)
#   - runs/rehearsal2/results_s4.json   (rebuilt-100k re-eval)
# Every step is idempotent and skipped when its artifact exists.
#   nohup setsid bash scripts/tpu_queue_r3s8.sh > /tmp/tpu_s8.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_s8.log
echo "=== s8 queue start $(date)" > $LOG

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

# never two TPU jobs at once: wait for the s7 queue
until grep -q "=== s7 queue done" /tmp/tpu_s7.log 2>/dev/null; do
  sleep 120
done
echo "s7 queue done $(date)" >> $LOG

COM=runs/rehearsal2_com
H200=runs/rehearsal2/logs/rehearsal_head200/ckpt
T30=$COM/logs/rehearsal_head_long_torso/ckpt
TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"
NEW=0

ev() {  # ev <out_json> <timeout> <args...> — skip if already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  NEW=1
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json)_s8.log" $TD "$@" --out "$out" \
    && [ -s "$out" ] || rm -f "$out"
}

# 200k full-schedule val anchor (stage D tail)
if [ "$(step_of "$H200")" -ge 199000 ] && [ ! -s runs/rehearsal200.json ]
then
  NEW=1
  wait_tpu
  run 10800 /tmp/eval200_s8.log python scripts/eval200.py
fi

# stage-E headroom evidence on the stronger checkpoints
mkdir -p $COM/long
if [ "$(step_of "$T30")" -ge 29000 ]; then
  ev $COM/long/temporal_delta_kt1fzd2.json 5400 --refresh 25 --frames 50 \
    --s_delta 16 12 --delta_keep 0.6 --delta_keep_torso 0.01 \
    --freeze_z_torso --dilate_every 2 --torso_ckpt "$T30"
fi
if [ "$(step_of "$H200")" -ge 199000 ]; then
  ev $COM/long/temporal_delta_head200.json 7200 --refresh 50 --frames 100 \
    --s_delta 16 12 --delta_keep 0.6 --dilate_every 2 \
    --head_ckpt "$H200"
fi

# stage-F re-eval of the rebuilt 100k checkpoint
if [ ! -s runs/rehearsal2/results_s4.json ]; then
  NEW=1
  wait_tpu
  run 7200 /tmp/reval_s8.log python scripts/rehearsal.py \
    --out runs/rehearsal2 --phase eval \
    && cp runs/rehearsal2/results.json runs/rehearsal2/results_s4.json
fi

if [ "$NEW" = 1 ]; then
  wait_tpu
  run 5400 /tmp/bench_s8.log python bench.py
  cp /tmp/bench_s8.log runs/bench_s8.log 2>/dev/null
fi

echo "=== s8 queue done $(date)" >> $LOG
