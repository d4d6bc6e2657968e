#!/bin/bash
# Round-2 queue 5: TPU measurement follow-ups. Waits for queue 4 (deep
# protocol studies) to release the chip, then runs the hardware smoke,
# the fp32/bf16 bench A/B, the per-stage breakdown, and the
# EM-USER-scale (57k-node) pipeline stress.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$(sed 's/[^0-9]//g' data/round2_queue4.pid)" 2>/dev/null; do
  sleep 60
done

echo "=== JOB 1: real-TPU pallas smoke ($(date)) ==="
python -u scripts/tpu_smoke.py

echo "=== JOB 2: bench fp32 ($(date)) ==="
python -u bench.py

echo "=== JOB 3: bench bf16 A/B ($(date)) ==="
BENCH_DTYPE=bfloat16 python -u bench.py

echo "=== JOB 4: per-stage breakdown ($(date)) ==="
python -u scripts/bench_stages.py

echo "=== JOB 5: 57k-node EM-USER-scale stress ($(date)) ==="
python -u scripts/stress_scale.py -n 57000 -n_subgraphs 320 -epochs 10

echo "=== QUEUE5 DONE ($(date)) ==="
