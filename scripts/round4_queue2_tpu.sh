#!/bin/bash
# Round-4 TPU queue #2 (VERDICT r3 tasks 3, 5, 8) — sequential, ONE TPU
# process at a time:
#   1. rebuild the EM-USER-scale instance + checkpoint (data/ was wiped at
#      the session boundary; also re-validates the 57k end-to-end time)
#   2. bench_serving on the round-4 OPTIMIZED predict path (overlapped
#      BFS, fused single-dispatch DTW, cached anchors) with the new
#      per-stage breakdown — target <= 50 ms/subgraph warm (was 244)
#   3. bench_knee: edges/s vs B in {64..2048} + XLA:TPU bytes/step for
#      the roofline restatement (each B is a fresh 2-10 min tunnel
#      compile — this stage is SLOW by construction)
# HARVEST the JSON lines into PERF.md/RESULTS.md promptly.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

python -u scripts/stress_scale.py -task scale57k_v2 -n 57000 -n_subgraphs 320
python -u scripts/bench_serving.py -task scale57k_v2 \
  -results data/results/scale57k_v2 -n 32
python -u scripts/bench_knee.py
echo "=== ROUND4 QUEUE2 DONE ($(date)) ==="
