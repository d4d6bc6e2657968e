#!/bin/bash
# Round-4 CPU queue #8: third (and calibrated) attempt at search>=frozen.
# Calibration findings (logs/holdout_calib.log, RESULTS.md round 4):
#   * the holdout estimator RANKS correctly — frozen-S coreness scores
#     holdout ~0.98 (> the SP winner's 0.93); the round-4b search failed
#     because (a) frozen-S's n_layers=5 was OUTSIDE the space (capped 4),
#     (b) the 120-epoch protocol handicapped vs the 200-epoch frozen
#     benchmark, (c) TPE starved S (2 of 56 trials).
# Fixes: n_layers 1-5 + lr low 1e-4 (space now contains both frozen-S
# configs), coreness at the 200-epoch protocol (fresh study, -tag e200),
# -stratified_rounds 4 (28 forced-coverage trials), finalist rerank.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

python -u scripts/seed_avg_search.py -task coreness5k_s53 -property coreness \
  -channels auto -objective holdout -trials 64 -hpo_seeds 2 \
  -finalists 6 -finalist_seeds 4 -stratified_rounds 4 -tag e200 \
  -search_epochs 200 -retest_epochs 200 -n 5000 -gen_seed 53

python -u scripts/seed_avg_search.py -task density250_s52 -property density \
  -channels auto -objective holdout -trials 56 -hpo_seeds 3 \
  -finalists 6 -finalist_seeds 4 -stratified_rounds 2 \
  -search_epochs 200 -retest_epochs 500 -gen_seed 52

echo "=== ROUND4 QUEUE8 DONE ($(date)) ==="
