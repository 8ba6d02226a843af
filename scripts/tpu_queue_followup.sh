#!/bin/bash
# Follow-up measurements that need the rehearsal checkpoints the main
# queue (scripts/tpu_queue.sh) regenerates: temporal depth-cache quality
# deltas. Waits for the main queue to finish, then runs unattended:
#   nohup bash scripts/tpu_queue_followup.sh > /tmp/tpu_followup.out 2>&1 &
# Artifacts: runs/rehearsal2_com/temporal_delta.json (+ /tmp copies).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
while ! grep -q "queue done" /tmp/tpu_queue.log 2>/dev/null; do sleep 120; done
echo "=== followup start $(date)" > /tmp/tpu_followup.log

run() {  # run <timeout_s> <log> <cmd...>
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  echo "$* rc=$? $(date)" >> /tmp/tpu_followup.log
  tail -2 "$log" >> /tmp/tpu_followup.log
}

run 3600 /tmp/temporal_delta.log python scripts/temporal_delta.py \
  --frames 24 --refresh 25 --s_delta 32 16
cp runs/rehearsal2_com/temporal_delta.json /tmp/temporal_delta.json 2>/dev/null
run 3600 /tmp/temporal_delta_t.log python scripts/temporal_delta.py \
  --frames 24 --refresh 25 --s_delta 32 16 --tighten
cp runs/rehearsal2_com/temporal_delta.json /tmp/temporal_delta_t.json 2>/dev/null
echo "=== followup done $(date)" >> /tmp/tpu_followup.log
