#!/bin/bash
# Round-4 TPU queue #9: finish the dress rehearsal. queue4 completed
# PPI-BP (10 seeds) but the HPO/EM stand-in embeddings OOM'd HBM (23.5G
# needed) — fixed by the chunked SpMM (EDGE_CHUNK message buffers).
# Trains the remaining embeddings, then reproduce_real on the three
# remaining tasks. Waits for queue4 AND queue5/queue6 job chain; the
# waiter keys on queue6's bash (last of the TPU chain).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for q in 4 5 6; do
  P=$(cat logs/queue_r4_$q.pid 2>/dev/null)
  [ -n "$P" ] || { echo "no queue_r4_$q.pid — refusing concurrent start"; exit 1; }
  while [ "$(ps -o comm= -p "$P" 2>/dev/null)" = "bash" ]; do sleep 60; done
done

python -u scripts/make_real_standins.py --emb -emb_epochs 10 \
  -tasks em_user
time python -u scripts/reproduce_real.py -n_seeds 10 \
  -tasks em_user
echo "=== ROUND4 QUEUE9 DONE ($(date)) ==="
