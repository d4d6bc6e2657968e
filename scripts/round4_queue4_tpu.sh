#!/bin/bash
# Round-4 TPU queue #4 (VERDICT r3 task 2): full-scale real-data dress
# rehearsal. Waits for queue2 (one TPU process at a time), then:
#   1. trains GIN embeddings for the four stand-in datasets (GraphSAINT,
#      shared base graph for the HPO pair)
#   2. runs scripts/reproduce_real.py WITHOUT -mini: loader validation ->
#      precompute -> the reference's FROZEN hyperparams unchanged ->
#      10-seed protocol -> table. Scores are stand-in scores (labels are
#      degree quantiles) — the deliverable is the pipeline executing at
#      published scale + wall-clock rows.
# HARVEST: the four experiment_results.json + the wall-clock + the table.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

Q2_PID=$(cat logs/queue_r4_2.pid 2>/dev/null)
[ -n "$Q2_PID" ] || { echo "no queue_r4_2.pid — refusing concurrent start"; exit 1; }
# wait only while the PID is still the queue's bash (PID-recycle guard)
while [ "$(ps -o comm= -p "$Q2_PID" 2>/dev/null)" = "bash" ]; do sleep 60; done

python -u scripts/make_real_standins.py --emb -emb_epochs 10
time python -u scripts/reproduce_real.py -n_seeds 10
echo "=== ROUND4 QUEUE4 DONE ($(date)) ==="
