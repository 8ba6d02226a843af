#!/bin/bash
# Stage 3 (after scripts/tpu_queue_followup.sh):
#  1. temporal evidence at the quality-matched keyframe rung — the
#     combined-lever operating point (auto rung from sample_sweep.json +
#     tightened bounds + s_delta ladder) — overwriting the canonical
#     temporal_delta.json bench.py gates on;
#  2. re-run the 100k eval (its first run predated the bf16 SSIM fix in
#     eval/metrics.py — results.json carried SSIM values outside [0,1]);
#  3. final bench with the complete evidence set.
#   nohup bash scripts/tpu_queue_stage3.sh > /tmp/tpu_stage3.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
while ! grep -q "followup done" /tmp/tpu_followup.log 2>/dev/null; do sleep 120; done
echo "=== stage3 start $(date)" > /tmp/tpu_stage3.log

run() {  # run <timeout_s> <log> <cmd...>
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  echo "$* rc=$? $(date)" >> /tmp/tpu_stage3.log
  tail -3 "$log" >> /tmp/tpu_stage3.log
}

run 3600 /tmp/temporal_delta_qm.log python scripts/temporal_delta.py \
  --frames 24 --refresh 25 --s_delta 32 16 8 --tighten --auto_rung
cp runs/rehearsal2_com/temporal_delta.json /tmp/temporal_delta_qm.json 2>/dev/null
run 6000 /tmp/eval100k_fixed.log python scripts/rehearsal.py \
  --out runs/rehearsal2 --phase eval
run 3000 /tmp/bench_r3d.log python bench.py
echo "=== stage3 done $(date)" >> /tmp/tpu_stage3.log
