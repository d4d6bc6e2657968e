#!/bin/bash
# Round-2 queue 17: per-stage breakdown v4 on the compact-sims path
# (the v3 numbers predate compact and are stale for production).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "=== JOB 1: bench_stages compact ($(date)) ==="
python -u scripts/bench_stages.py
echo "=== QUEUE17 DONE ($(date)) ==="
