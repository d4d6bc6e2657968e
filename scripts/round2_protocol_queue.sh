#!/bin/bash
# Round-2 protocol queue: runs the queued synthetic protocol jobs serially
# on the one real TPU chip. Launch with:
#   nohup bash scripts/round2_protocol_queue.sh > data/round2_queue.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== JOB 1: coreness on a 5000-node base graph ($(date)) ==="
python -u scripts/run_synthetic_protocol.py \
    -property coreness -task coreness5k -n 5000 -n_subgraphs 250 \
    -trials 40 -seeds 10 -sampler tpe \
    > data/coreness5k_protocol.log 2>&1

echo "=== JOB 2: density250 40-trial TPE resume + 10-seed retest ($(date)) ==="
python -u scripts/run_synthetic_protocol.py \
    -property density -task density250 -n_subgraphs 250 \
    -trials 40 -seeds 10 -sampler tpe \
    > data/density250_resume.log 2>&1

echo "=== QUEUE DONE ($(date)) ==="
