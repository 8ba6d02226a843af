#!/bin/bash
# Per-field s_delta evidence: head 16 (or 8) + torso 32 at delta_keep 0.6.
# If the 16t32 point holds the <=0.05 dB composite gate, bench picks it by
# cost and the composite temporal video rises from ~17.9 toward ~23 fps.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== per-field s_delta evidence start $(date)"
python scripts/temporal_delta.py --frames 50 --refresh 25 \
  --s_delta 16 8 --s_delta_torso 32 --delta_keep 0.6 \
  --auto_rung --tighten --split train \
  --out runs/rehearsal2_com/temporal_delta_pf60.json
echo "pf60 rc=$? $(date)"
python bench.py
echo "=== per-field queue done $(date)"
