#!/bin/bash
# Round-5 follow-up queue: runs after scripts/tpu_queue_r5.sh finishes
# (polls its done marker; proceeds anyway after MAX_WAIT so the round
# always ends with fresh bench/stream artifacts).
#   E1. masked operating-point study on the FINAL head ckpt, including
#       the occ (zero-mass cut) rows — overwrites results.json so the
#       picker never mixes checkpoints (old file kept as results_100k)
#   E2. serving latency with the round-5 compute-isolation sweep:
#       comp (gated), head, and the gated roll16 cadence
#   E3. archive pre-switch (100k-pair) temporal evidence out of the
#       selection dir once final-pair driving evidence exists
#   E4. final bench -> runs/bench_r5.json
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_r5b.log
MAX_WAIT=${MAX_WAIT:-16000}
echo "=== r5b start $(date)" >> $LOG

waited=0
until grep -q "r5 queue done" /tmp/tpu_r5.log 2>/dev/null; do
  [ $waited -ge $MAX_WAIT ] && { echo "r5 wait timeout" >> $LOG; break; }
  sleep 120; waited=$((waited + 120))
done
echo "=== r5 main queue finished/timeout $(date)" >> $LOG

tpu_ok() {
  timeout 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
assert float(x[0, 0]) == 128.0
" >/dev/null 2>&1
}
wait_tpu() {
  until tpu_ok; do echo "tpu down $(date)" >> $LOG; sleep 180; done
}
run() {
  local t=$1 log=$2; shift 2
  echo ">>> $* ($(date))" >> $LOG
  timeout "$t" "$@" > "$log" 2>&1
  echo "<<< rc=$?" >> $LOG
}

R2=runs/rehearsal2
COM=runs/rehearsal2_com
H200=$R2/logs/rehearsal_head200/ckpt

# ---- E0: quality-matched-rung version of the winning temporal point -
# Every r5 phase-A/B run measured PAPER-RUNG (64+128) keyframes (no
# --samples/--importance override); the r50 rt25 winner's amortized
# keyframe cost is then marginal against 25 fps. Re-gate the same
# config with 16+32 keyframes (the round-4 quality-matched rung) so
# bench can time the cheap-keyframe configuration AT ITS OWN GATE.
# Head s16/s32 rows at refresh 50 come along for the head headline.
H200S=$R2/logs/rehearsal_head200/ckpt
wait_tpu
[ -f runs/rehearsal2_com/temporal_delta_drive_r50rt25_rung.json ] || \
run 2400 /tmp/r5b_e0.log python scripts/temporal_delta.py \
  --tighten --split train --smooth_audio 1 --head_ckpt $H200S \
  --torso_ckpt runs/rehearsal2_com/logs/rehearsal_head_t5_torso/ckpt \
  --subject_dir runs/rehearsal2_drive --frames 60 --refresh 50 \
  --s_delta 32 16 --delta_keep 0.8 --dilate_every 2 --roll_k_torso 25 \
  --samples 16 --importance 32 \
  --out runs/rehearsal2_com/temporal_delta_drive_r50rt25_rung.json

# ---- E1: masked study incl. occ rows on the FINAL checkpoint --------
if [ ! -f $R2/results_100k.json ]; then
  cp $R2/results.json $R2/results_100k.json
  rm $R2/results.json
fi
wait_tpu
run 4800 /tmp/r5b_e1.log python scripts/rehearsal.py --phase eval \
  --out $R2 --head_ckpt $H200 --eval_modes \
  full,pruned_40,masked_60,masked_40,masked_28,masked_40_hp,masked_60_occ,masked_40_occ,masked_28_occ

# ---- E3 (before stream/bench so they select from clean evidence):
# archive pre-switch temporal evidence once final-pair driving
# evidence exists. The archived files are the 100k-pair record; the
# selection dir keeps only evidence measured on checkpoints bench
# actually times.
if ls $COM/temporal_delta_drive*.json >/dev/null 2>&1; then
  mkdir -p $COM/archive_100k_pair
  for f in $COM/temporal_delta.json $COM/temporal_delta_b30.json \
           $COM/temporal_delta_b50.json $COM/temporal_delta_kt1*.json \
           $COM/temporal_delta_r50k60*.json $COM/temporal_delta_s24.json; do
    [ -f "$f" ] && mv "$f" $COM/archive_100k_pair/
  done
  echo "archived pre-switch evidence: $(ls $COM/archive_100k_pair | wc -l) files" >> $LOG
fi

# ---- E2: serving latency + compute isolation ------------------------
wait_tpu
run 3600 /tmp/r5b_e2a.log python scripts/stream_latency.py --frames 100 \
  --mode comp --quality 24 --out runs/stream_latency.json
wait_tpu
run 3600 /tmp/r5b_e2b.log python scripts/stream_latency.py --frames 100 \
  --mode head --quality 24 --out runs/stream_latency_head.json
wait_tpu
run 3600 /tmp/r5b_e2c.log python scripts/stream_latency.py --frames 100 \
  --mode comp --roll_k 16 --quality 24 \
  --out runs/stream_latency_roll16.json

# ---- E4: final bench ------------------------------------------------
wait_tpu
run 2400 /tmp/r5b_bench.log python bench.py
cp runs/bench_live.json runs/bench_r5.json 2>/dev/null
tail -c 2000 /tmp/r5b_bench.log | tail -1 >> $LOG
echo "=== r5b done $(date)" >> $LOG
