#!/bin/bash
# ONE-SHOT session artifact: the PID below was bound at generation time
# on the machine that launched it; do not re-run after a reboot.
# Round-3 CPU queue #4: waits for the orphaned bf16 parity sweep (PID 7892),
# then the time-trimmed seed-averaged searches (hpo_seeds 2, 150-epoch
# trials — the de-saturated objective still averages away half the
# 25-example-val noise at 60% of the cost; retests stay 500ep x 10 seeds).
set -x
cd /root/repo
export PYTHONPATH=/root/repo
while kill -0 7892 2>/dev/null; do sleep 30; done
python -u scripts/seed_avg_search.py -task cutratio250 -property cut_ratio -channels S -trials 40 -hpo_seeds 2 -search_epochs 150
python -u scripts/seed_avg_search.py -task density250_emb80s43 -property density -channels S -trials 25 -hpo_seeds 2 -search_epochs 150
echo "=== ROUND3 QUEUE4 DONE ($(date)) ==="
