#!/bin/bash
# Follow-on: composite temporal evidence at refresh 10. At refresh 25
# the importance-sampled composite missed the <=0.05 dB gate by 0.004;
# at refresh 10 drift shrinks while the amortized fps (~12, keyframes
# at the qm rung + s_delta 32 deltas) still beats the 11.56 fps
# quality-matched composite — if the gate opens, composite_best rises.
# wait for the r3evid queue (it writes its pid at start); a missing
# pid file means it either finished and cleaned up or was never
# launched — warn and proceed rather than racing a guess
if [ -f /tmp/r3evid.pid ]; then
    while kill -0 "$(cat /tmp/r3evid.pid)" 2>/dev/null; do sleep 20; done
else
    echo "WARNING: /tmp/r3evid.pid absent; not waiting" >&2
fi
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== r10 evidence start $(date)"
python scripts/temporal_delta.py --frames 50 --refresh 10 \
  --s_delta 32 16 --auto_rung --tighten --split train \
  --out runs/rehearsal2_com/temporal_delta_r10.json
echo "r10 rc=$? $(date)"
python bench.py
echo "=== r10 evidence done $(date)"
