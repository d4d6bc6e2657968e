#!/bin/bash
# Round-2 queue 9: corrected per-stage breakdown (bench_stages v3) on the
# real chip + a fresh bench pair. Waits for queue8.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$1" 2>/dev/null; do
  sleep 60
done

echo "=== JOB 1: per-stage breakdown v3 ($(date)) ==="
python -u scripts/bench_stages.py

echo "=== JOB 2: bench fp32 ($(date)) ==="
python -u bench.py

echo "=== JOB 3: bench bf16 ($(date)) ==="
BENCH_DTYPE=bfloat16 python -u bench.py

echo "=== QUEUE9 DONE ($(date)) ==="
