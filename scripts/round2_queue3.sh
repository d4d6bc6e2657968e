#!/bin/bash
# Round-2 protocol queue, part 3: waits for queue2 (cutratio250 channel
# search) to release the TPU, then retests the ROUND-1 density250 HPO
# winner on 10 seeds for an apples-to-apples comparison with the round-2
# TPE winner's 10-seed retest. Launch:
#   nohup bash scripts/round2_queue3.sh > data/round2_queue3.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$(sed 's/[^0-9]//g' data/round2_queue2.pid)" 2>/dev/null; do
    sleep 60
done

echo "=== JOB 4: density250 round-1-winner 10-seed retest ($(date)) ==="
python -u -c "
from subgnn_tpu.cli.test import run_seeds
run_seeds('density250', 'data', 'data/best_density250/hyperparams.json',
          n_seeds=10, out_dir='data/results/density250_r1winner_10seeds')
" > data/density250_r1winner_10seeds.log 2>&1

echo "=== QUEUE3 DONE ($(date)) ==="
