#!/bin/bash
# Round-2 queue 14: TPU A/B of bench compact-sims path + final fresh bench.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "=== JOB 1: bench compact (default) ($(date)) ==="
python -u bench.py
echo "=== JOB 2: bench NO compact (A/B) ($(date)) ==="
BENCH_NO_COMPACT=1 python -u bench.py
echo "=== JOB 3: bench compact bf16 ($(date)) ==="
BENCH_DTYPE=bfloat16 python -u bench.py
echo "=== QUEUE14 DONE ($(date)) ==="
