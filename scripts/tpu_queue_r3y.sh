#!/bin/bash
# Round-3 probe queue (runs after tpu_queue_r3x.sh): push the gated
# operating points past the already-PASSED north star.
#   1. composite s_delta 14 at the torso-frozen point (r25/k60/kt1/fz):
#      s16 gates at -0.116 dB, s12 fails at 0.52 — s14 is the candidate
#      knee (saves ~1.2 ms/delta frame if it gates)
#   2. head refresh-50 s_delta 12/14 ladder at k60: r50 s16 measures
#      42.6 dB vs the >=40 dB gate; s12 projects ~40.3 (r25 s12 is 42.8
#      and r50 costs ~2.5 dB) — marginal, s14 is the fallback rung
#   3. IF dilate_every=2 gated at s16 (r3x's kt1fzd2 run) AND s14 gated
#      in (1): measure the stacked point s14+d2
#   4. re-bench so the gated selection picks up whatever passed
#   nohup setsid bash scripts/tpu_queue_r3y.sh > /tmp/tpu_y.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_y.log
echo "=== y queue start $(date)" > $LOG

tpu_ok() {
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

# never two TPU jobs at once: wait for the x queue
until grep -q "=== x queue done" /tmp/tpu_x.log 2>/dev/null; do
  sleep 120
done
echo "x queue done $(date)" >> $LOG

run() {  # run <timeout_s> <log> <cmd...>
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  local rc=$?
  echo "$* rc=$rc $(date)" >> $LOG
  tail -3 "$log" >> $LOG
  return $rc
}

COM=runs/rehearsal2_com
TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"
ev() {  # ev <out_json> <timeout> <args...> — skip if already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json).log" $TD "$@" --out "$out" \
    && [ -s "$out" ] || rm -f "$out"
}

# gate <file> <mode_key> <max_delta_db>: 0 iff the measured composite
# delta-vs-GT at mode_key is within the bar
gate() {
  python - "$1" "$2" "$3" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
v = d["modes"].get(sys.argv[2], {}).get("delta_psnr_vs_gt")
sys.exit(0 if v is not None and v <= float(sys.argv[3]) else 1)
EOF
}

# 1. composite s14 at the torso-frozen point
ev $COM/temporal_delta_kt1fzs14.json 1800 --refresh 25 --frames 50 \
  --s_delta 14 --delta_keep 0.6 --delta_keep_torso 0.01 --freeze_z_torso

# 2. head refresh-50 ladder s12/s14 (composite modes from the same run
# are extra dose-response points; the head gate reads head_only_*)
ev $COM/temporal_delta_r50k60s12.json 2700 --refresh 50 --frames 100 \
  --s_delta 12 14 --delta_keep 0.6

# 3. stacked s14+d2 only if both ingredients gated independently
if gate $COM/temporal_delta_kt1fzd2.json s_delta_16_k60_kt1_d2_fz 0.05 \
    && gate $COM/temporal_delta_kt1fzs14.json s_delta_14_k60_kt1_fz 0.05
then
  ev $COM/temporal_delta_kt1fzs14d2.json 1800 --refresh 25 --frames 50 \
    --s_delta 14 --delta_keep 0.6 --delta_keep_torso 0.01 \
    --freeze_z_torso --dilate_every 2
else
  echo "stacked s14+d2 skipped (an ingredient failed its gate) $(date)" >> $LOG
fi

# 4. re-bench with whatever new evidence gates
wait_tpu
run 3600 /tmp/bench_y.log python bench.py

echo "=== y queue done $(date)" >> $LOG
