#!/bin/bash
# Round-3 measurement orchestrator — outage-resilient version of the
# rebuild -> profile -> evidence-grid -> eval -> bench chain.
#
# The axon TPU tunnel stalls for hours at a time (one 9h outage already
# this round; another began ~04:22 mid-head-train). Every stage here is
# gated on a live-tunnel probe and is idempotent: checkpoint training
# resumes from the newest step, evidence runs are re-runnable, so the
# orchestrator can simply loop until each stage's done-condition holds.
#   nohup bash scripts/tpu_queue_r3orch.sh > /tmp/tpu_orch.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_orch.log
echo "=== orchestrator start $(date)" > $LOG

step_of() {
  ls -d "$1"/step_* 2>/dev/null | sed 's/.*step_0*//' | sort -n | tail -1 \
    | grep . || echo -1
}

tpu_ok() {  # true iff a trivial TPU program completes (fetch forces it:
            # block_until_ready lies through the tunnel — BASELINE.md)
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

HEAD=runs/rehearsal2/logs/rehearsal_head/ckpt
TORSO=runs/rehearsal2_com/logs/rehearsal_head_torso/ckpt

# wait for the in-flight tpu_queue_rebuild.sh (if any) to exit — its
# own per-stage timeouts kill wedged children; never run two trainers
# against one checkpoint dir
until grep -q "rebuild done" /tmp/tpu_rebuild.log 2>/dev/null; do
  sleep 60
done
echo "in-flight rebuild exited: $(tail -1 /tmp/tpu_rebuild.log)" >> $LOG

# a torso checkpoint trained against a PARTIAL head (the in-flight run
# reaches its torso stage even when the head train was cut by the
# outage) must be retrained against the finished head
if [ "$(step_of $HEAD)" -lt 99000 ] && [ "$(step_of $TORSO)" -ge 0 ]; then
  echo "discarding torso ckpt trained against partial head" >> $LOG
  rm -rf "$TORSO"
fi

# phase A: head to 100k (resumes from the newest step each attempt)
until [ "$(step_of $HEAD)" -ge 99000 ]; do
  wait_tpu
  run 9000 /tmp/train2.log python scripts/rehearsal.py \
    --out runs/rehearsal2 --phase train --epochs 1000
done
echo "head complete: step $(step_of $HEAD)" >> $LOG

# phase B: composite subject + torso
if [ ! -f runs/rehearsal2_com/HeadNeRF_config.txt ]; then
  wait_tpu
  run 1200 /tmp/makecom.log python scripts/rehearsal.py \
    --out runs/rehearsal2_com --phase make --with_torso
fi
until [ "$(step_of $TORSO)" -ge 5000 ]; do
  wait_tpu
  run 2400 /tmp/traintorso.log python -m idealnerf_tpu.cli.train_torso \
    --config runs/rehearsal2_com/HeadNeRF_config.txt \
    --head_ckpt "$HEAD" --steps 6000 \
    --N_rand 3072 --N_samples 64 --N_importance 128 --dim_aud 64 \
    --dim_latent 32 --lrate 3e-4 --i_weights 2000 --i_print 200
done
echo "torso complete: step $(step_of $TORSO)" >> $LOG

# phase C: scanned-cycle delta-frame cost (checkpoint-free, 10 min)
until [ -s runs/temporal_profile.json ] \
    && python -c "import json;d=json.load(open('runs/temporal_profile.json'));exit(0 if 'cycle_ms_per_frame' in d else 1)"; do
  wait_tpu
  run 2400 /tmp/tprof.log python scripts/temporal_profile.py --reps 20
done

# phase D: evidence grid on the rebuilt checkpoints
COM=runs/rehearsal2_com
TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"
ev() {  # ev <out_json> <timeout> <args...> — skip if already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json).log" $TD "$@" --out "$out" \
    && [ -s "$out" ] || rm -f "$out"
}

# the committed canonical evidence files describe the DELETED round-3
# checkpoint — regenerate them on the rebuilt one (once; the marker
# keeps a restarted orchestrator from re-deleting partial progress)
if [ ! -f $COM/.evidence_fresh ]; then
  rm -f $COM/temporal_delta.json $COM/temporal_delta_k60.json \
        $COM/temporal_delta_r50k60.json
  touch $COM/.evidence_fresh
fi

# rung evidence first (auto_rung reads it; old file = deleted ckpt)
if [ ! -f runs/rehearsal2/sample_sweep_fresh ]; then
  rm -f runs/rehearsal2/sample_sweep.json
  wait_tpu
  run 2400 /tmp/sweep.log python scripts/sample_sweep.py \
    --rungs 64+192,16+32,12+24 --tighten \
    && touch runs/rehearsal2/sample_sweep_fresh
fi

ev $COM/temporal_delta_b50.json 1800 --refresh 25 --frames 50 \
  --s_delta 24 16 --delta_keep 0.6 --kf_blend 0.5
ev $COM/temporal_delta_s24.json 1500 --refresh 25 --frames 50 \
  --s_delta 24 --delta_keep 0.6
ev $COM/temporal_delta.json 1500 --refresh 25 --frames 50 --s_delta 32 16
ev $COM/temporal_delta_k60.json 1500 --refresh 25 --frames 50 \
  --s_delta 32 16 --delta_keep 0.6
ev $COM/temporal_delta_r50k60.json 2400 --refresh 50 --frames 100 \
  --s_delta 32 16 --delta_keep 0.6
ev $COM/temporal_delta_b30.json 1500 --refresh 25 --frames 50 \
  --s_delta 16 --delta_keep 0.6 --kf_blend 0.3

# phase E: re-evaluate the rebuilt checkpoint (val PSNR/SSIM + pruned
# deltas -> results.json) and refresh the headline bench
wait_tpu
run 2400 /tmp/reval.log python scripts/rehearsal.py \
  --out runs/rehearsal2 --phase eval
wait_tpu
run 3600 /tmp/bench.log python bench.py
cp /tmp/bench.log runs/bench_r3cycle.log 2>/dev/null

echo "=== orchestrator done $(date)" >> $LOG
