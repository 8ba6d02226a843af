#!/bin/bash
# Follow-up measurements that need the rehearsal checkpoints the main
# queue (scripts/tpu_queue.sh) regenerates: temporal depth-cache quality
# deltas at a ladder of operating points, then a FINAL bench run that
# picks up all the quality evidence (sample_sweep.json +
# temporal_delta.json) for its evidence-gated best-mode rows. Waits for
# the main queue to finish, then runs unattended:
#   nohup bash scripts/tpu_queue_followup.sh > /tmp/tpu_followup.out 2>&1 &
# Artifacts: runs/rehearsal2_com/temporal_delta.json (canonical,
# refresh 25, tightened bounds), temporal_delta_plain.json /
# temporal_delta_r50.json (side studies), /tmp/bench_r3c.log.
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

# plain (untightened) side study first — for the tighten-vs-plain delta
run 3600 /tmp/temporal_delta_plain.log python scripts/temporal_delta.py \
  --frames 24 --refresh 25 --s_delta 32 16 8 \
  --out runs/rehearsal2_com/temporal_delta_plain.json
# canonical evidence file (tightened per-field bounds — the quality
# configuration the CLIs expose via --tighten_bounds)
run 3600 /tmp/temporal_delta.log python scripts/temporal_delta.py \
  --frames 24 --refresh 25 --s_delta 32 16 8 --tighten
cp runs/rehearsal2_com/temporal_delta.json /tmp/temporal_delta.json 2>/dev/null
# drift at a 2x keyframe interval (side study; bench only gates on
# evidence measured at its own refresh)
run 3600 /tmp/temporal_delta_r50.log python scripts/temporal_delta.py \
  --frames 51 --refresh 50 --s_delta 32 16 --tighten \
  --out runs/rehearsal2_com/temporal_delta_r50.json
# final bench with the complete evidence set
run 3000 /tmp/bench_r3c.log python bench.py
echo "=== followup done $(date)" >> /tmp/tpu_followup.log
