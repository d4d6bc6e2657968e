#!/bin/bash
# Round-4 TPU queue #18: EM-USER dress rehearsal, attempt 5 — after the
# dispatch-size fix. diag_emuser_emb.py pinned the crash: NOT memory
# (temp 1.72G/15.75G), but the ~80s 10-epoch fused dispatch; the axon
# worker kills long executions. node_emb now sizes GraphSAINT dispatches
# by edge-step work (~16s at EM-USER scale). Health-gated: the diag's
# probe-4 deliberately re-killed the worker, so wait for the tunnel.
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

python -u scripts/make_real_standins.py --emb -emb_epochs 10 -tasks em_user
time python -u scripts/reproduce_real.py -n_seeds 10 -tasks em_user
echo "=== ROUND4 QUEUE18 DONE ($(date)) ==="
