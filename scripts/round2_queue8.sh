#!/bin/bash
# Round-2 queue 8: reference-frozen-hparams 10-seed retests on the
# 250-instance synthetics (the cheap experiment that WON on cutratio250:
# the reference's own winning configs transfer better than our
# HPO-found ones on some instances). Waits for queue7 (density250 deep
# study) to release the chip.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$1" 2>/dev/null; do
  sleep 60
done

echo "=== JOB 1: density250 reference-frozen ALL 10-seed retest ($(date)) ==="
python -u -c "
from subgnn_tpu.cli.test import run_seeds
run_seeds('density250', 'data',
          '/root/reference/best_model_hyperparameters/density/all_density_hyperparams.json',
          n_seeds=10, out_dir='data/results/density250_ALLref_10seeds')
"

echo "=== JOB 2: density250 reference-frozen S 10-seed retest ($(date)) ==="
python -u -c "
from subgnn_tpu.cli.test import run_seeds
run_seeds('density250', 'data',
          '/root/reference/best_model_hyperparameters/density/S_density_hyperparams.json',
          n_seeds=10, out_dir='data/results/density250_Sref_10seeds')
"

echo "=== JOB 3: component250 reference-frozen ALL 10-seed retest ($(date)) ==="
python -u -c "
from subgnn_tpu.cli.test import run_seeds
run_seeds('component250', 'data',
          '/root/reference/best_model_hyperparameters/component/all_component_hyperparams.json',
          n_seeds=10, out_dir='data/results/component250_ALLref_10seeds')
"

echo "=== QUEUE8 DONE ($(date)) ==="
