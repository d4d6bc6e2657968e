#!/bin/bash
# Round-4 TPU queue #6: validate the new flagship B=1024 through bench.py
# itself (bf16 default + fp32 A/B) and re-run tpu_smoke (Pallas DTW +
# plan-backward on chip). Waits for queue5.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

Q5_PID=$(cat logs/queue_r4_5.pid 2>/dev/null)
[ -n "$Q5_PID" ] || { echo "no queue_r4_5.pid — refusing concurrent start"; exit 1; }
while [ "$(ps -o comm= -p "$Q5_PID" 2>/dev/null)" = "bash" ]; do sleep 60; done

timeout 2400 python -u scripts/tpu_smoke.py
timeout 2400 python -u bench.py
BENCH_DTYPE=float32 timeout 2400 python -u bench.py
echo "=== ROUND4 QUEUE6 DONE ($(date)) ==="
