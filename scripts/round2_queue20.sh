#!/bin/bash
# Round-2 queue 20: 100k retry with chunked dispatches. Waits for queue19.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "=== JOB 1: full 100k pipeline (chunked node-emb) ($(date)) ==="
python -u scripts/stress_scale.py -task scale100k -n 100000 \
  -n_subgraphs 1000 -epochs 10
echo "=== QUEUE20 DONE ($(date)) ==="
