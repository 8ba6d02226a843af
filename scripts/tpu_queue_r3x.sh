#!/bin/bash
# Round-3 extension queue (runs after tpu_queue_r3fz.sh):
#   1. re-measure the delta-frame cost model incl. the NEW dilation
#      on/off split (temporal_profile.py dilation_ms) — calibrates the
#      operating-point cost model's DIL constant
#   2. dilate_every=2 quality evidence at the torso-frozen composite
#      point (s16+s12 share one run) and at the head's refresh-50 point
#   3. train the rehearsal head to the reference's FULL 200k-step
#      schedule (helper.py:109 N_iters) as a SEPARATE expname — the
#      committed quality-gate evidence describes the 100k checkpoint,
#      which stays untouched
#   4. val-render the 200k checkpoint (full / pruned_60 / masked_60)
#   5. final bench
#   nohup setsid bash scripts/tpu_queue_r3x.sh > /tmp/tpu_x.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_x.log
echo "=== x queue start $(date)" > $LOG

step_of() {
  ls -d "$1"/step_* 2>/dev/null | sed 's/.*step_0*//' | sort -n | tail -1 \
    | grep . || echo -1
}

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

# wait for the fz queue (never two TPU jobs at once)
until grep -q "fz queue done" /tmp/tpu_fz.log 2>/dev/null; do
  sleep 60
done
echo "fz queue done $(date)" >> $LOG

# 1. cost-model re-measurement with the dilation split
until [ -s runs/temporal_profile.json ] && python -c "
import json; d = json.load(open('runs/temporal_profile.json'))
exit(0 if 'dilation_ms' in d else 1)"; do
  wait_tpu
  run 2400 /tmp/tprof_x.log python scripts/temporal_profile.py --reps 20
done

COM=runs/rehearsal2_com
TD="python scripts/temporal_delta.py --split train --auto_rung --tighten"
ev() {  # ev <out_json> <timeout> <args...> — skip if already produced
  local out=$1 t=$2; shift 2
  [ -s "$out" ] && return 0
  wait_tpu
  run "$t" "/tmp/$(basename "$out" .json).log" $TD "$@" --out "$out" \
    && [ -s "$out" ] || rm -f "$out"
}

# 2. dilate_every evidence
ev $COM/temporal_delta_kt1fzd2.json 1800 --refresh 25 --frames 50 \
  --s_delta 16 12 --delta_keep 0.6 --delta_keep_torso 0.01 \
  --freeze_z_torso --dilate_every 2
ev $COM/temporal_delta_r50k60d2.json 2400 --refresh 50 --frames 100 \
  --s_delta 16 --delta_keep 0.6 --dilate_every 2

# 3. reference full schedule: continue the 100k head to 200k under a
# separate expname (auto-resume from the copied checkpoint)
H100=runs/rehearsal2/logs/rehearsal_head
H200=runs/rehearsal2/logs/rehearsal_head200
if [ ! -d "$H200" ] && [ "$(step_of $H100/ckpt)" -ge 99000 ]; then
  cp -r "$H100" "$H200"
fi
PAPER="--N_rand 3072 --N_samples 64 --N_importance 128 --dim_aud 64 \
  --dim_latent 32 --mouth_rays 512 --torso_rays 512 --lrate 3e-4 \
  --lc_weight 0.005 --i_weights 2000 --i_print 200"
while [ -d "$H200" ] && [ "$(step_of $H200/ckpt)" -lt 199000 ]; do
  wait_tpu
  STEP=$(step_of $H200/ckpt)
  EP=$(( (200000 - STEP) / 110 + 1 ))
  run 7200 /tmp/train200.log python -m idealnerf_tpu.cli.train_head \
    --config runs/rehearsal2/HeadNeRF_config.txt \
    --expname rehearsal_head200 $PAPER --epochs $EP
done
echo "head200 at step $(step_of $H200/ckpt)" >> $LOG

# 4. val render of the 200k checkpoint
if [ "$(step_of $H200/ckpt)" -ge 199000 ] \
    && [ ! -s runs/rehearsal200.json ]; then
  wait_tpu
  run 2400 /tmp/eval200.log python - <<'EOF'
import json, time
from idealnerf_tpu.cli import render_val

PAPER = dict(N_rand=3072, N_samples=64, N_importance=128, dim_aud=64,
             dim_latent=32, mouth_rays=512, torso_rays=512,
             lrate="3e-4", lc_weight=0.005, i_weights=2000, i_print=200)
base = ["--config", "runs/rehearsal2/HeadNeRF_config.txt",
        "--head_ckpt", "runs/rehearsal2/logs/rehearsal_head200/ckpt",
        "--save_path", "runs/rehearsal2/renders200"]
for k, v in PAPER.items():
    base += [f"--{k}", str(v)]
results = {}
for name, extra in (("full", []), ("pruned_60", ["--pruned", "60"]),
                    ("masked_60", ["--pruned", "60",
                                   "--prior_masked", "1"])):
    t0 = time.time()
    m = render_val.main(base + extra)
    results[name] = {"psnr": m["psnr"], "ssim": m["ssim"],
                     "wall_s": round(time.time() - t0, 1)}
    print(name, results[name], flush=True)
for mode in ("pruned_60", "masked_60"):
    results[f"delta_psnr_{mode}"] = round(
        results["full"]["psnr"] - results[mode]["psnr"], 3)
with open("runs/rehearsal200.json", "w") as fh:
    json.dump(results, fh, indent=2)
EOF
fi

# 5. final bench
wait_tpu
run 3600 /tmp/bench_x.log python bench.py

echo "=== x queue done $(date)" >> $LOG
