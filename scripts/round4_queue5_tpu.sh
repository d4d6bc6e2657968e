#!/bin/bash
# Round-4 TPU queue #5: re-measure serving latency on the COMPACT predict
# path (anchor-column sims shipped instead of the (B,C,57k) NP_sim tensor
# — the measured 4.4s "forward" stage was that tensor's H2D over the
# tunnel). Waits for queue4. Target: <= 50 ms/subgraph warm.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

Q4_PID=$(cat logs/queue_r4_4.pid 2>/dev/null)
[ -n "$Q4_PID" ] || { echo "no queue_r4_4.pid — refusing concurrent start"; exit 1; }
while [ "$(ps -o comm= -p "$Q4_PID" 2>/dev/null)" = "bash" ]; do sleep 60; done

timeout 2400 python -u scripts/bench_serving.py -task scale57k_v2 \
  -results data/results/scale57k_v2 -n 32
echo "=== ROUND4 QUEUE5 DONE ($(date)) ==="
