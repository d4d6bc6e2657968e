#!/bin/bash
# Round-2 queue 12: headroom demo — 100k-node / 1000-subgraph instance
# (~2x EM-USER scale) end-to-end on one chip. Waits for queue11.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$1" 2>/dev/null; do
  sleep 60
done

echo "=== JOB 1: 100k-node / 1000-subgraph pipeline ($(date)) ==="
python -u scripts/stress_scale.py -task scale100k -n 100000 \
  -n_subgraphs 1000 -epochs 10

echo "=== QUEUE12 DONE ($(date)) ==="
