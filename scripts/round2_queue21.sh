#!/bin/bash
# Round-2 queue 21: serving latency at 57k + at PPI shape. Waits for queue20.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "=== JOB 1: serving latency at 57k ($(date)) ==="
python -u scripts/bench_serving.py -task scale57k_v2 -results data/results/scale57k_v2
echo "=== JOB 2: serving latency at PPI shape ($(date)) ==="
python -u scripts/bench_serving.py -task scale17k_ppi -results data/results/scale17k_ppi
echo "=== QUEUE21 DONE ($(date)) ==="
