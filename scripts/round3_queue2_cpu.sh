#!/bin/bash
# Round-3 CPU queue #2: waits for queue1 (bare PID in logs/round3_queue1.pid)
# then runs the TPE real-objective A/B (VERDICT task 3) and the cutratio
# seed-averaged search (VERDICT task 7).
set -x
cd /root/repo
export PYTHONPATH=/root/repo
P=$(cat logs/round3_queue1.pid) || { echo "queue1 pid file missing — refusing to start (concurrency hazard)"; exit 1; }
while kill -0 "$P" 2>/dev/null; do sleep 30; done
python -u scripts/validate_tpe.py -objective real -reps 3 -trials 40 -real_epochs 30
python -u scripts/seed_avg_search.py -task cutratio250 -property cut_ratio -channels S -trials 40 -hpo_seeds 3
echo "=== ROUND3 QUEUE2 DONE ($(date)) ==="
