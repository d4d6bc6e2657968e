#!/bin/bash
# Round-2 protocol queue, part 2: waits for the part-1 queue (coreness5k +
# density250 resume) to release the TPU, then runs the cut-ratio-250
# channel-search study. Launch with:
#   nohup bash scripts/round2_queue2.sh > data/round2_queue2.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$(sed 's/[^0-9]//g' data/round2_queue.pid)" 2>/dev/null; do
    sleep 60
done

echo "=== JOB 3: cutratio250 45-trial TPE w/ channel-subset search ($(date)) ==="
python -u scripts/run_synthetic_protocol.py \
    -property cut_ratio -task cutratio250 -n_subgraphs 250 \
    -trials 45 -seeds 10 -sampler tpe -search_channels \
    > data/cutratio250_channels.log 2>&1

echo "=== QUEUE2 DONE ($(date)) ==="
