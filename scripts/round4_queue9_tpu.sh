#!/bin/bash
# Round-4 TPU queue #9: finish the dress rehearsal. History: the em_user
# stand-in embeddings OOM'd HBM in queue4 (fixed by the chunked SpMM);
# ppi/metab/neuro embeddings survived and queue4 ran (or is running)
# their 10-seed rehearsals. This queue trains em_user embeddings, then
# runs reproduce_real for em_user PLUS any task whose 10-seed results dir
# is missing (so a queue4 crash mid-neuro cannot silently lose coverage).
# Waits for the whole TPU chain (queues 4 -> 5 -> 6).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for q in 4 5 6; do
  P=$(cat logs/queue_r4_$q.pid 2>/dev/null)
  [ -n "$P" ] || { echo "no queue_r4_$q.pid — refusing concurrent start"; exit 1; }
  while [ "$(ps -o comm= -p "$P" 2>/dev/null)" = "bash" ]; do sleep 60; done
done

TASKS="em_user"
for t in ppi_bp hpo_metab hpo_neuro; do
  [ -f "data/results/${t}_frozen_10seeds/experiment_results.json" ] || TASKS="$TASKS,$t"
done
echo "rehearsal tasks: $TASKS"

python -u scripts/make_real_standins.py --emb -emb_epochs 10 -tasks "$TASKS"
time python -u scripts/reproduce_real.py -n_seeds 10 -tasks "$TASKS"
echo "=== ROUND4 QUEUE9 DONE ($(date)) ==="
