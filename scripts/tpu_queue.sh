#!/bin/bash
# Round-3 TPU measurement queue — SELF-HEALING: workspace resets between
# sessions wipe everything gitignored under runs/ (checkpoints, exported
# subjects), so phase 0 regenerates any missing artifact before the
# measurement set runs. Waits for the axon tunnel, then runs unattended:
#   nohup bash scripts/tpu_queue.sh > /tmp/tpu_queue.out 2>&1 &
# Artifacts: /tmp/bench_r3*.log (bench JSON), runs/rehearsal2/results.json
# (100k eval PSNR+SSIM x5 modes), runs/rehearsal2/second_stage_rehearsal
# .json, runs/rehearsal2/sample_sweep.json (quality-vs-samples ladder,
# plain + tightened), runs/rehearsal2_com/composite_delta.json (keep 0.3
# + tightened variants in /tmp/compdelta*.json), runs/track_bench.json,
# runs/train_profile.json. Then update BASELINE.md's round-3 rows.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); float((x@x).sum())
" >/dev/null 2>&1; then
    echo "UP $(date +%s)" > /tmp/tpu_status; break
  fi
  echo "DOWN $(date +%s)" > /tmp/tpu_status; sleep 60
done
echo "=== TPU up, queue start $(date)" > /tmp/tpu_queue.log

run() {  # run <timeout_s> <log> <cmd...>
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  echo "$* rc=$? $(date)" >> /tmp/tpu_queue.log
  tail -2 "$log" >> /tmp/tpu_queue.log
}

step_of() {  # newest checkpoint step under dir $1, or -1
  ls -d "$1"/step_* 2>/dev/null | sed 's/.*step_0*//' | sort -n | tail -1 \
    | grep . || echo -1
}

# ---- phase 0: regenerate wiped artifacts -------------------------------
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

# ---- measurement set ----------------------------------------------------
run 3000 /tmp/bench_r3.log python bench.py
run 6000 /tmp/eval100k.log python scripts/rehearsal.py --out runs/rehearsal2 --phase eval
run 7200 /tmp/2nd_r3.log python scripts/rehearsal_2nd.py --steps 2000 --crop 256
run 5400 /tmp/sweep_r3.log python scripts/sample_sweep.py --tighten
run 2400 /tmp/compdelta30.log python scripts/composite_delta.py --keep 0.3 --frames 6
cp runs/rehearsal2_com/composite_delta.json /tmp/compdelta30.json 2>/dev/null
run 2400 /tmp/compdelta_t.log python scripts/composite_delta.py --keep 0.4 --frames 6 --tighten
cp runs/rehearsal2_com/composite_delta.json /tmp/compdelta_t.json 2>/dev/null
run 2400 /tmp/trackbench.log python scripts/track_bench.py
run 1800 /tmp/trainprofile.log python scripts/train_profile.py
# re-run bench so the evidence-gated quality-matched rows pick up the
# fresh sample_sweep.json
run 3000 /tmp/bench_r3b.log python bench.py
echo "=== queue done $(date)" >> /tmp/tpu_queue.log
