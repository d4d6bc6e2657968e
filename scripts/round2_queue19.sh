#!/bin/bash
# Round-2 queue 19: gather-ceiling re-run (fixed anti-hoist) + a SECOND
# density250 instance (fresh seed) under the frozen-reference S config —
# quantifies instance-to-instance variance for the ceiling argument.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 60; done

echo "=== JOB 1: gather ceiling (fixed) ($(date)) ==="
python -u scripts/bench_gather_ceiling.py

echo "=== JOB 2: density250 instance v2 (seed 43) generation ($(date)) ==="
python -m subgnn_tpu.cli.prepare_dataset -out data/density250v2 \
  -property density -seed 43 -n 1000 -n_subgraphs 250 -emb_epochs 100

echo "=== JOB 3: density250v2 frozen-ref-S 10-seed retest ($(date)) ==="
python -u - <<'PY'
from subgnn_tpu.cli.test import run_seeds
run_seeds('density250v2', 'data',
          '/root/reference/best_model_hyperparameters/density/S_density_hyperparams.json',
          n_seeds=10, out_dir='data/results/density250v2_Sref_10seeds')
PY

echo "=== QUEUE19 DONE ($(date)) ==="
