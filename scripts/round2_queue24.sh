#!/bin/bash
# Round-2 queue 24: replaces queue23 — same jobs, with the risky 100k
# attempt LAST so a worker crash cannot block the other measurements.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

wait_healthy() {
  until timeout 240 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda: jnp.ones(8).sum())())" >/dev/null 2>&1; do
    echo "tpu unhealthy, waiting ($(date))"
    sleep 120
  done
  echo "tpu healthy ($(date))"
}

wait_healthy
echo "=== JOB 1: serving latency at 57k ($(date)) ==="
timeout 1800 python -u scripts/bench_serving.py -task scale57k_v2 -results data/results/scale57k_v2

wait_healthy
echo "=== JOB 2: serving latency at PPI shape ($(date)) ==="
timeout 1800 python -u scripts/bench_serving.py -task scale17k_ppi -results data/results/scale17k_ppi

wait_healthy
echo "=== JOB 3: density250v2 Sref 10-seed retest ($(date)) ==="
timeout 5400 python -u - <<'PY'
from subgnn_tpu.cli.test import run_seeds
run_seeds('density250v2', 'data',
          '/root/reference/best_model_hyperparameters/density/S_density_hyperparams.json',
          n_seeds=10, out_dir='data/results/density250v2_Sref_10seeds')
PY

wait_healthy
echo "=== JOB 4 (LAST, risky): full 100k pipeline ($(date)) ==="
timeout 3600 python -u scripts/stress_scale.py -task scale100k -n 100000 \
  -n_subgraphs 1000 -epochs 10
echo "=== QUEUE24 DONE ($(date)) ==="
