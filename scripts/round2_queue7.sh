#!/bin/bash
# Round-2 queue 7: re-run queue4's JOB 3 (density250 deep study), which
# crashed after importing a half-edited train/loop.py (the large-array
# jit-argument refactor landed between its process start and the call-site
# edit). Waits for queue6 (TPU re-measurements) to release the chip.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$1" 2>/dev/null; do
  sleep 60
done

echo "=== JOB 1: density250 DEEP 40-trial TPE + 10 seeds ($(date)) ==="
python -u scripts/run_synthetic_protocol.py -property density -task density250 \
  -n_subgraphs 250 -trials 40 -seeds 10 -sampler tpe -deep

echo "=== QUEUE7 DONE ($(date)) ==="
