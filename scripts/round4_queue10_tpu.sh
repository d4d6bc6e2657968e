#!/bin/bash
# Round-4 TPU queue #10: remat A/B at the spill-regime batch sizes
# (can jax.checkpoint defer the B=2048 cliff / fp32@1024 collapse?).
# Waits for queue9 (the dress-rehearsal finisher).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

P=$(cat logs/queue_r4_9.pid 2>/dev/null)
[ -n "$P" ] || { echo "no queue_r4_9.pid — refusing concurrent start"; exit 1; }
while [ "$(ps -o comm= -p "$P" 2>/dev/null)" = "bash" ]; do sleep 60; done

timeout 3600 python -u scripts/bench_remat.py
echo "=== ROUND4 QUEUE10 DONE ($(date)) ==="
