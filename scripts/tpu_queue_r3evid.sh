#!/bin/bash
# Regenerate temporal quality evidence with the committed cross-frame
# importance sampling (the prior evidence predates it; bench.py gates
# the temporal fps rows on these files). Canonical outputs bench reads:
#   runs/rehearsal2_com/temporal_delta_r50.json  (refresh 50)
#   runs/rehearsal2_com/temporal_delta.json      (refresh 25)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo $$ > /tmp/r3evid.pid   # follow-on queues wait on this pid
echo "=== r3 evidence queue start $(date)"
python scripts/temporal_delta.py --frames 101 --refresh 50 \
  --s_delta 32 16 8 --auto_rung --tighten --split train \
  --out runs/rehearsal2_com/temporal_delta_r50.json
echo "r50 rc=$? $(date)"
python scripts/temporal_delta.py --frames 50 --refresh 25 \
  --s_delta 32 16 8 --auto_rung --tighten --split train
echo "r25 rc=$? $(date)"
python bench.py
echo "=== r3 evidence queue done $(date)"
