#!/bin/bash
# Round-2 queue 6: clean TPU re-measurements. queue5 accidentally ran
# while queue4 held the chip (stale pid file), so its numbers are
# contaminated; this queue waits on queue4's REAL wrapper pid, then
# re-runs the benches with the chip idle, the reworked interleaved
# per-stage breakdown, and the 57k-node stress (now that large arrays
# travel as jit args instead of HLO constants — the HTTP 413 fix).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$1" 2>/dev/null; do
  sleep 60
done

echo "=== JOB 1: bench fp32 ($(date)) ==="
python -u bench.py

echo "=== JOB 2: bench bf16 A/B ($(date)) ==="
BENCH_DTYPE=bfloat16 python -u bench.py

echo "=== JOB 3: per-stage breakdown, interleaved medians ($(date)) ==="
python -u scripts/bench_stages.py

echo "=== JOB 4: 57k-node EM-USER-scale stress ($(date)) ==="
python -u scripts/stress_scale.py -n 57000 -n_subgraphs 320 -epochs 10

echo "=== QUEUE6 DONE ($(date)) ==="
