#!/bin/bash
# Round-2 queue 4: close the remaining synthetic quality gaps with the
# reference's winning search region (deep space: n_layers<=4, patch counts,
# LSTM depth/dropout, batch size, 200 epochs).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== JOB 1: cutratio250 reference-frozen S 10-seed retest ($(date)) ==="
python -u -c "
from subgnn_tpu.cli.test import run_seeds
run_seeds('cutratio250', 'data',
          '/root/reference/best_model_hyperparameters/cutratio/S_cutratio_hyperparams.json',
          n_seeds=10, out_dir='data/results/cutratio250_Sref_10seeds')
"

echo "=== JOB 2: cutratio250 S-only DEEP 40-trial TPE + 10 seeds ($(date)) ==="
python -u scripts/run_synthetic_protocol.py -property cut_ratio -task cutratio250 \
  -n_subgraphs 250 -trials 40 -seeds 10 -sampler tpe -channels S -deep

echo "=== JOB 3: density250 DEEP 40-trial TPE + 10 seeds ($(date)) ==="
python -u scripts/run_synthetic_protocol.py -property density -task density250 \
  -n_subgraphs 250 -trials 40 -seeds 10 -sampler tpe -deep

echo "=== JOB 4: component250 DEEP 40-trial TPE + 10 seeds ($(date)) ==="
python -u scripts/run_synthetic_protocol.py -property cc -task component250 \
  -n_subgraphs 250 -trials 40 -seeds 10 -sampler tpe -deep

echo "=== QUEUE4 DONE ($(date)) ==="
