#!/bin/bash
# Round-2 queue 26 (CPU): regenerate the component250 v2/v3/v4 instances
# and run the frozen-P-config 500-epoch 10-seed variance controls that
# were queued before the container reboot wiped /tmp and data/.
set -x
cd /root/repo
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu

timeout 28800 python -u scripts/instance_variance_study.py \
  -tasks component_P -seeds 43,44,45
echo "=== QUEUE26_CPU DONE ($(date)) ==="
