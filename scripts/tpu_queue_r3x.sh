#!/bin/bash
# Round-3 extension queue — runs AFTER tpu_queue_r3orch.sh finishes.
#
# Adds the one untried cheap composite operating point (head 32 / torso
# 16 in-band delta samples at keep 0.6 — the torso is the static field,
# every prior per-field probe cut the HEAD count instead), the refresh-50
# variant if the r25 gate holds, regenerates composite_delta.json (the
# committed one was measured on the deleted checkpoint), and re-runs the
# headline bench so the final numbers see all evidence.
#   nohup setsid bash scripts/tpu_queue_r3x.sh > /tmp/tpu_r3x.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_r3x.log
echo "=== r3x start $(date)" > $LOG

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

run() {  # run <timeout_s> <log> <cmd...>
  local t=$1 log=$2; shift 2
  timeout "$t" "$@" > "$log" 2>&1
  local rc=$?
  echo "$* rc=$rc $(date)" >> $LOG
  tail -3 "$log" >> $LOG
  return $rc
}

until grep -q "orchestrator done" /tmp/tpu_orch.log 2>/dev/null; do
  sleep 120
done
echo "orchestrator finished: $(tail -1 /tmp/tpu_orch.log)" >> $LOG

COM=runs/rehearsal2_com
TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"
ev() {  # ev <out_json> <timeout> <args...> — skip if already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json).log" $TD "$@" --out "$out" \
    && [ -s "$out" ] || rm -f "$out"
}

# head 32 / torso 16, keep 0.6 — the untried asymmetric point
ev $COM/temporal_delta_a.json 1800 --refresh 25 --frames 50 \
  --s_delta 32 --s_delta_torso 16 --delta_keep 0.6

# refresh-50 variant only if the r25 gate held (<= 0.05 dB)
if python - <<'EOF'
import json, sys
try:
    d = json.load(open("runs/rehearsal2_com/temporal_delta_a.json"))
    m = d["modes"]["s_delta_32t16_k60"]
    sys.exit(0 if m["delta_psnr_vs_gt"] <= 0.05 else 1)
except Exception:
    sys.exit(1)
EOF
then
  ev $COM/temporal_delta_a50.json 2400 --refresh 50 --frames 100 \
    --s_delta 32 --s_delta_torso 16 --delta_keep 0.6
fi

# composite fast-path quality deltas on the rebuilt checkpoint (the
# committed composite_delta.json described the deleted one)
wait_tpu
run 2400 /tmp/compdelta.log python scripts/composite_delta.py

# final headline bench over the complete evidence set
wait_tpu
run 3600 /tmp/bench_r3x.log python bench.py
cp /tmp/bench_r3x.log runs/bench_r3x.log 2>/dev/null

echo "=== r3x done $(date)" >> $LOG
