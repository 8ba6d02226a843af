#!/bin/bash
# Post-rebuild evidence queue: regenerate the quality-gate evidence on
# the REBUILT checkpoints (the old runs/ artifacts were wiped; evidence
# must describe a checkpoint that exists), then measure the new
# delta-frame depth-placement knobs (kf_blend / uni_frac) at cheaper
# s_delta — the composite needs the gate open at s_delta<=24 to reach
# the 25-fps north star (t_delta = 12.0 + 1.038*s ms, ROADMAP).
# Waits for scripts/tpu_queue_rebuild.sh to finish before touching the
# TPU.  Usage:
#   nohup bash scripts/tpu_queue_r3blend.sh > /tmp/tpu_blend.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
echo "=== blend queue start $(date)" > /tmp/tpu_blend.log

while ! grep -q "rebuild done" /tmp/tpu_rebuild.log 2>/dev/null; do
  sleep 60
done
echo "rebuild finished: $(tail -1 /tmp/tpu_rebuild.log)" >> /tmp/tpu_blend.log

run() {  # run <timeout_s> <log> <cmd...>
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  echo "$* rc=$? $(date)" >> /tmp/tpu_blend.log
  tail -3 "$log" >> /tmp/tpu_blend.log
}

COM=runs/rehearsal2_com
TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"

# -1. scanned-cycle delta-frame cost first (10 min, checkpoint-free):
#     its numbers decide whether further in-scan work is worth building
#     while the evidence grid below runs
run 1800 /tmp/tprof.log python scripts/temporal_profile.py --reps 20

# 0. rung evidence on the new checkpoint (auto_rung reads this; the old
#    file describes the deleted checkpoint — regenerate, don't merge)
rm -f runs/rehearsal2/sample_sweep.json
run 2400 /tmp/sweep.log python scripts/sample_sweep.py \
  --rungs 64+192,16+32,12+24 --tighten

# 1. kf_blend gate-opening attempt at the cheap rungs (the new lever)
run 1800 /tmp/td_b50.log $TD --refresh 25 --frames 50 \
  --s_delta 24 16 --delta_keep 0.6 --kf_blend 0.5 \
  --out $COM/temporal_delta_b50.json

# 2. s24 no-blend control (isolates the blend's contribution)
run 1500 /tmp/td_s24.log $TD --refresh 25 --frames 50 \
  --s_delta 24 --delta_keep 0.6 \
  --out $COM/temporal_delta_s24.json

# 3. canonical + k60 gate points regenerated on the new checkpoint
run 1500 /tmp/td_canon.log $TD --refresh 25 --frames 50 --s_delta 32 16
run 1500 /tmp/td_k60.log $TD --refresh 25 --frames 50 \
  --s_delta 32 16 --delta_keep 0.6 \
  --out $COM/temporal_delta_k60.json

# 4. r50 k60 (the head-video headline gate) on the new checkpoint
run 2400 /tmp/td_r50k60.log $TD --refresh 50 --frames 100 \
  --s_delta 32 16 --delta_keep 0.6 \
  --out $COM/temporal_delta_r50k60.json

# 5. milder blend dose point at s16 (only informative if b50 moved it)
run 1500 /tmp/td_b30.log $TD --refresh 25 --frames 50 \
  --s_delta 16 --delta_keep 0.6 --kf_blend 0.3 \
  --out $COM/temporal_delta_b30.json

echo "=== blend queue done $(date)" >> /tmp/tpu_blend.log
