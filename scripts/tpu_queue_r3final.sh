#!/bin/bash
# Round-3 final measurement queue (replaces tpu_queue_followup.sh +
# tpu_queue_stage3.sh, which ran against two measurement bugs fixed
# mid-round: (a) warm fps came from a second reenact() call that
# recompiled everything, (b) temporal drift studies silently clamped to
# the 10-frame val split, so refresh>10 never rendered a second
# keyframe). All evidence below uses the fixed scripts and the
# 100-frame train split for temporal cycles.
#   nohup bash scripts/tpu_queue_r3final.sh > /tmp/tpu_r3final.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
echo "=== r3final start $(date)" > /tmp/tpu_r3final.log

run() {  # run <timeout_s> <log> <cmd...>
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  echo "$* rc=$? $(date)" >> /tmp/tpu_r3final.log
  tail -3 "$log" >> /tmp/tpu_r3final.log
}

# 1. canonical temporal evidence: quality-matched keyframe rung +
#    tightened per-field bounds, TWO full refresh-25 cycles on the train
#    split (warm keyframes at 25; drift measured across whole cycles)
run 5400 /tmp/temporal_qm.log python scripts/temporal_delta.py \
  --split train --frames 50 --refresh 25 --s_delta 32 16 8 \
  --tighten --auto_rung
cp runs/rehearsal2_com/temporal_delta.json /tmp/temporal_qm.json 2>/dev/null

# 2. refresh-50 drift study at the same operating point (keyframes at
#    0/50; warm keyframe measured at 50)
run 5400 /tmp/temporal_r50.log python scripts/temporal_delta.py \
  --split train --frames 101 --refresh 50 --s_delta 32 16 8 \
  --tighten --auto_rung --out runs/rehearsal2_com/temporal_delta_r50.json

# 3. 100k eval with the fixed (host f64) SSIM — replaces the broken
#    SSIM values in results.json
run 6000 /tmp/eval100k_fixed.log python scripts/rehearsal.py \
  --out runs/rehearsal2 --phase eval

# 4. composite fast-mode delta with per-frame warm timing
run 2400 /tmp/compdelta_fixed.log python scripts/composite_delta.py \
  --keep 0.4 --frames 6 --tighten

# 5. final bench with the complete evidence set
run 3000 /tmp/bench_r3final.log python bench.py

# 6. sample sweep re-run for clean SSIM columns (PSNR gating unchanged)
run 5400 /tmp/sweep_fixed.log python scripts/sample_sweep.py --tighten

# 7. bench once more in case the sweep moved the quality-matched rung
run 3000 /tmp/bench_r3final2.log python bench.py
echo "=== r3final done $(date)" >> /tmp/tpu_r3final.log
