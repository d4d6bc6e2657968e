#!/bin/bash
# Round-4 TPU queue #16: health-gated EM-USER crash diagnosis. The worker
# died during queue15's GraphSAINT pretrain (third crash on this path);
# poll until the tunnel answers a trivial dispatch, then run the staged
# diagnostic (AOT memory_analysis -> 1 step -> 1 epoch -> 10-epoch chunk).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while true; do
  if timeout 90 python -u -c "
import jax, jax.numpy as jnp
print(jax.devices(), jnp.ones((8,8)).sum())"; then
    echo "=== TPU BACK ($(date)) ==="
    break
  fi
  sleep 120
done

timeout 3000 python -u scripts/diag_emuser_emb.py
echo "=== ROUND4 QUEUE16 DONE ($(date)) ==="
