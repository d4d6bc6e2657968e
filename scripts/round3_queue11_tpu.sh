#!/bin/bash
# Round-3 TPU queue #11: serving-latency measurement — the predict() path
# is a headline extension with NO measured latency in RESULTS/PERF yet.
# Rebuilds the EM-USER-scale instance + checkpoint (also re-validates the
# round-2 "57k end-to-end in ~218s" row post-reboot), then measures
# cold/warm predict(). ONE TPU process at a time (queue8 finished).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

python -u scripts/stress_scale.py -task scale57k_v2 -n 57000 -n_subgraphs 320
python -u scripts/bench_serving.py -task scale57k_v2 \
  -results data/results/scale57k_v2 -n 32
echo "=== ROUND3 QUEUE11 DONE ($(date)) ==="
