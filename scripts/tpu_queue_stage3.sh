#!/bin/bash
# Stage 3: regenerate measurement artifacts invalidated by the bf16 SSIM
# fix (eval/metrics.py): the 100k-checkpoint eval ran before the fix and
# its results.json carries SSIM values outside [0, 1]. Waits for the
# followup queue, then re-runs the eval phase:
#   nohup bash scripts/tpu_queue_stage3.sh > /tmp/tpu_stage3.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
while ! grep -q "followup done" /tmp/tpu_followup.log 2>/dev/null; do sleep 120; done
echo "=== stage3 start $(date)" > /tmp/tpu_stage3.log
timeout 6000 python scripts/rehearsal.py --out runs/rehearsal2 --phase eval \
  > /tmp/eval100k_fixed.log 2>&1
echo "eval rc=$? $(date)" >> /tmp/tpu_stage3.log
tail -3 /tmp/eval100k_fixed.log >> /tmp/tpu_stage3.log
echo "=== stage3 done $(date)" >> /tmp/tpu_stage3.log
