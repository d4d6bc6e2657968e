#!/bin/bash
# Round-4 TPU queue #11: EM-USER dress rehearsal, attempt 3. queue9's OOM
# remainder was the link-pred loss's whole-array endpoint gathers (3.67M
# train edges x 128 = 3.8GB/buffer) — now chunked+rematerialized
# (_edge_nll). Waits for queue10 (remat A/B).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

P=$(cat logs/queue_r4_10.pid 2>/dev/null)
[ -n "$P" ] || { echo "no queue_r4_10.pid — refusing concurrent start"; exit 1; }
while [ "$(ps -o comm= -p "$P" 2>/dev/null)" = "bash" ]; do sleep 60; done

python -u scripts/make_real_standins.py --emb -emb_epochs 10 -tasks em_user
time python -u scripts/reproduce_real.py -n_seeds 10 -tasks em_user
echo "=== ROUND4 QUEUE11 DONE ($(date)) ==="
