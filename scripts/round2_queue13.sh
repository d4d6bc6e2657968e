#!/bin/bash
# Round-2 queue 13: gather-ceiling microbench. Waits for queue12.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "=== JOB 1: gather ceiling ($(date)) ==="
python -u scripts/bench_gather_ceiling.py
echo "=== QUEUE13 DONE ($(date)) ==="
