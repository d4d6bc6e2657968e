#!/bin/bash
# Round-3 CPU queue #3 (replaces queue1's remaining v3/v4 channel runs and
# queue2 — one sequential queue, re-prioritized after the v1 channel sweep
# showed N/P lose to frozen-S on density: the gap is not channel choice).
set -x
cd /root/repo
export PYTHONPATH=/root/repo
# 1. TPE real-objective A/B (VERDICT task 3, ~30 min)
python -u scripts/validate_tpe.py -objective real -reps 3 -trials 40 -real_epochs 8
# 2. bf16-vs-fp32 parity at the headline configs (VERDICT task 6, ~1 h)
python -u scripts/bf16_parity_sweep.py
# 3. cutratio seed-averaged deep TPE + 10-seed retest (VERDICT task 7)
python -u scripts/seed_avg_search.py -task cutratio250 -property cut_ratio -channels S -trials 40 -hpo_seeds 3
# 4. density seed-averaged deep TPE on v1 (oracle ceiling 0.92; VERDICT task 1)
python -u scripts/seed_avg_search.py -task density250 -property density -channels S -trials 40 -hpo_seeds 3
# 5. same on the ceiling-1.0 v4 instance draw (gen seed 45)
python -u scripts/seed_avg_search.py -task density250v4 -property density -channels S -gen_seed 45 -trials 40 -hpo_seeds 3
echo "=== ROUND3 QUEUE3 DONE ($(date)) ==="
