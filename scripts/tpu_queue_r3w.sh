#!/bin/bash
# Post-r3z wrap-up: re-run the rehearsal eval matrix (now including
# masked_60 — the budget-restored prior-masked point; masked_40's fine
# budget is only ~19% of frame rays and starves a sharp model by
# 0.378 dB while the prior itself is lossless).
#   nohup setsid bash scripts/tpu_queue_r3w.sh > /tmp/tpu_r3w.out 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
LOG=/tmp/tpu_r3w.log
echo "=== r3w start $(date)" > $LOG

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

until grep -q "r3z done" /tmp/tpu_r3z.log 2>/dev/null; do
  sleep 120
done
echo "r3z finished" >> $LOG

wait_tpu
timeout 3000 python scripts/rehearsal.py --out runs/rehearsal2 \
  --phase eval > /tmp/reval2.log 2>&1
echo "reval rc=$? $(date)" >> $LOG
tail -3 /tmp/reval2.log >> $LOG

echo "=== r3w done $(date)" >> $LOG
