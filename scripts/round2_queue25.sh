#!/bin/bash
# Round-2 queue 25: post-donation re-validation on the real chip.
# Waits for queue24 (if still running), then re-runs the hardware smoke
# (Pallas lowerings + fused epoch now with donated buffers) and bench.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# wait for queue24 (bare PID in the file, if present)
if [ -f /tmp/queue24.pid ]; then
  Q24=$(cat /tmp/queue24.pid)
  while kill -0 "$Q24" 2>/dev/null; do sleep 60; done
fi
# fallback: wait until no round2_queue24.sh bash remains
while ps -o args= -C bash 2>/dev/null | grep -q round2_queue24; do sleep 60; done

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
echo "=== QUEUE25 DONE ($(date)) ==="
