#!/bin/bash
# Round-4 TPU queue #13: EM-USER dress rehearsal, attempt 4. queue11's
# OOM was the padded neighbor table (57k x 36k-degree hub = 7.8 GB) used
# by the GraphSAINT walker — now walks the flat CSR arrays (O(E)).
# No predecessor running on TPU (queue10/11 done).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for q in 10 11; do
  P=$(cat logs/queue_r4_$q.pid 2>/dev/null)
  [ -n "$P" ] || { echo "no queue_r4_$q.pid — refusing concurrent start"; exit 1; }
  while [ "$(ps -o comm= -p "$P" 2>/dev/null)" = "bash" ]; do sleep 30; done
done

python -u scripts/make_real_standins.py --emb -emb_epochs 10 -tasks em_user
time python -u scripts/reproduce_real.py -n_seeds 10 -tasks em_user
echo "=== ROUND4 QUEUE13 DONE ($(date)) ==="
