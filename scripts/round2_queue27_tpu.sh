#!/bin/bash
# Round-2 queue 27 (TPU): recover the coreness5k HPO winner config that was
# lost when the container reboot wiped data/ (the only copy lived at
# data/best_coreness5k/hyperparams.json). Re-runs the 40-trial TPE protocol;
# run_synthetic_protocol.py now also writes the winner to
# configs/best/coreness5k_hyperparams.json (version-controlled).
# Waits for queue26_tpu to free the chip.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -f /tmp/queue26_tpu.pid ]; then
  Q26=$(cat /tmp/queue26_tpu.pid)
  while kill -0 "$Q26" 2>/dev/null; do sleep 60; done
fi
# fallback when the pid file is missing (e.g. /tmp wiped again): never
# share the chip with a still-running queue26 — two processes on one
# chip crashed the TPU worker once (CLAUDE.md queue hygiene)
while ps -o args= -C bash 2>/dev/null | grep -q round2_queue26_tpu; do
  sleep 60
done

wait_healthy() {
  until timeout 420 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda: jnp.ones(8).sum())())" >/dev/null 2>&1; do
    echo "tpu unhealthy, waiting ($(date))"
    sleep 120
  done
  echo "tpu healthy ($(date))"
}

wait_healthy
echo "=== coreness5k 40-trial TPE + 10-seed retest ($(date)) ==="
timeout 21600 python -u scripts/run_synthetic_protocol.py \
  -property coreness -task coreness5k -n 5000 -n_subgraphs 250 \
  -trials 40 -seeds 10 -sampler tpe
echo "=== QUEUE27_TPU DONE ($(date)) ==="
