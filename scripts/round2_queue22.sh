#!/bin/bash
# Round-2 queue 22: redo the density250v2 frozen-ref-S 10-seed retest
# (first attempt stalled at seed 4 on a wedged tunnel dispatch).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "=== JOB 1: density250v2 Sref 10-seed retest (redo) ($(date)) ==="
python -u - <<'PY'
from subgnn_tpu.cli.test import run_seeds
run_seeds('density250v2', 'data',
          '/root/reference/best_model_hyperparameters/density/S_density_hyperparams.json',
          n_seeds=10, out_dir='data/results/density250v2_Sref_10seeds')
PY
echo "=== QUEUE22 DONE ($(date)) ==="
