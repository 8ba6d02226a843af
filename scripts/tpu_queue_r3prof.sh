#!/bin/bash
# Stage 3: after the blend-evidence queue, measure the scanned-cycle
# delta-frame cost (scripts/temporal_profile.py now times render.cycle)
# and refresh the headline bench numbers on the rebuilt subject.
#   nohup bash scripts/tpu_queue_r3prof.sh > /tmp/tpu_prof.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
echo "=== prof queue start $(date)" > /tmp/tpu_prof.log

while ! grep -q "blend queue done" /tmp/tpu_blend.log 2>/dev/null; do
  sleep 60
done

run() {
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  echo "$* rc=$? $(date)" >> /tmp/tpu_prof.log
  tail -3 "$log" >> /tmp/tpu_prof.log
}

# re-evaluate the rebuilt checkpoint: val PSNR/SSIM + pruned-mode deltas
# (results.json currently describes the deleted round-3 checkpoint)
run 2400 /tmp/reval.log python scripts/rehearsal.py \
  --out runs/rehearsal2 --phase eval

run 3600 /tmp/bench.log python bench.py
cp /tmp/bench.log runs/bench_r3cycle.log 2>/dev/null
echo "=== prof queue done $(date)" >> /tmp/tpu_prof.log
