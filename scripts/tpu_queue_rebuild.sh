#!/bin/bash
# Rebuild the converged rehearsal checkpoints after a workspace reset
# (gitignored runs/ artifacts — exported subjects, 100k head ckpt, 6k
# torso ckpt — are wiped between sessions; every quality measurement
# depends on them). Rebuild ONLY — measurement scripts run separately.
#   nohup bash scripts/tpu_queue_rebuild.sh > /tmp/tpu_rebuild.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
echo "=== rebuild start $(date)" > /tmp/tpu_rebuild.log

run() {  # run <timeout_s> <log> <cmd...>
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  echo "$* rc=$? $(date)" >> /tmp/tpu_rebuild.log
  tail -2 "$log" >> /tmp/tpu_rebuild.log
}

step_of() {  # newest checkpoint step under dir $1, or -1
  ls -d "$1"/step_* 2>/dev/null | sed 's/.*step_0*//' | sort -n | tail -1 \
    | grep . || echo -1
}

if [ ! -f runs/rehearsal2/HeadNeRF_config.txt ]; then
  run 1200 /tmp/make2.log python scripts/rehearsal.py \
    --out runs/rehearsal2 --phase make
fi
HEAD_CKPT=runs/rehearsal2/logs/rehearsal_head/ckpt
if [ "$(step_of $HEAD_CKPT)" -lt 99000 ]; then
  # 1000 epochs x ~100 steps = 100k paper-config steps (~75 min at
  # 23.7 steps/s); auto-resumes from the newest step if interrupted
  run 9000 /tmp/train2.log python scripts/rehearsal.py \
    --out runs/rehearsal2 --phase train --epochs 1000
fi
if [ ! -f runs/rehearsal2_com/HeadNeRF_config.txt ]; then
  run 1200 /tmp/makecom.log python scripts/rehearsal.py \
    --out runs/rehearsal2_com --phase make --with_torso
fi
TORSO_CKPT=runs/rehearsal2_com/logs/rehearsal_head_torso/ckpt
if [ "$(step_of $TORSO_CKPT)" -lt 5000 ]; then
  run 2400 /tmp/traintorso.log python -m idealnerf_tpu.cli.train_torso \
    --config runs/rehearsal2_com/HeadNeRF_config.txt \
    --head_ckpt "$HEAD_CKPT" --steps 6000 \
    --N_rand 3072 --N_samples 64 --N_importance 128 --dim_aud 64 \
    --dim_latent 32 --lrate 3e-4 --i_weights 2000 --i_print 200
fi
echo "=== rebuild done $(date) head=$(step_of $HEAD_CKPT) torso=$(step_of $TORSO_CKPT)" >> /tmp/tpu_rebuild.log
