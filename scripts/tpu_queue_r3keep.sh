#!/bin/bash
# delta_keep quality/fps evidence on the converged checkpoint. Hypothesis:
# frozen weak-foreground rays HOLD the keyframe's full-schedule values, which
# beat a 33-sample resample — so pruning may cut the composite's static
# per-delta-frame bias (currently 0.054 dB at s32/refresh 25) while raising
# delta fps. Side files; bench gates only on plain (unsuffixed) rungs.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== delta_keep evidence start $(date)"
python scripts/temporal_delta.py --frames 50 --refresh 25 \
  --s_delta 32 16 --delta_keep 0.6 --auto_rung --tighten --split train \
  --out runs/rehearsal2_com/temporal_delta_k60.json
echo "k60 rc=$? $(date)"
python scripts/temporal_delta.py --frames 50 --refresh 25 \
  --s_delta 32 --delta_keep 0.4 --auto_rung --tighten --split train \
  --out runs/rehearsal2_com/temporal_delta_k40.json
echo "k40 rc=$? $(date)"
echo "=== delta_keep evidence done $(date)"
