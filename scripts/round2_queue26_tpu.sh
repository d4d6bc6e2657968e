#!/bin/bash
# Round-2 queue 26 (TPU): container rebooted and wiped /tmp + data/, so
# queue25 never ran. Same jobs: re-validate the donation-era trainer on
# the real chip (tpu_smoke), then bench fp32 + bf16 for BENCH_r2 evidence.
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
echo "=== JOB 1: tpu_smoke on donation-era trainer ($(date)) ==="
timeout 1800 python -u scripts/tpu_smoke.py

wait_healthy
echo "=== JOB 2: bench.py (donation-era, fp32) ($(date)) ==="
timeout 2400 python -u bench.py

wait_healthy
echo "=== JOB 3: bench.py bf16 ($(date)) ==="
timeout 2400 env BENCH_DTYPE=bfloat16 python -u bench.py
echo "=== QUEUE26_TPU DONE ($(date)) ==="
