#!/bin/bash
# Round-2 queue 11: verify the median-of-3 bench.py on the chip + TPU
# pallas smoke, after queue10 releases the chip.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$1" 2>/dev/null; do
  sleep 60
done

echo "=== JOB 1: bench median-of-3 ($(date)) ==="
python -u bench.py

echo "=== JOB 2: tpu pallas smoke ($(date)) ==="
python -u scripts/tpu_smoke.py

echo "=== QUEUE11 DONE ($(date)) ==="
