#!/bin/bash
# Round-4 CPU queue #3 (VERDICT r3 task 1, second attempt): channel-aware
# seed-averaged searches with the NESTED-HOLDOUT objective.
#
# queue1's measured negative result (RESULTS.md round 4): with the subset
# IN the space but a best-val objective, TPE picked NP at seed-avg-val
# 0.90 which retested 0.492 — best-val saturates at ~0.8-0.9 for EVERY
# subset on the 25-example val split while test ranges 0.49-0.88. The
# holdout objective scores each trial's restored best-val checkpoint on a
# train-carved holdout (SubGNNPipeline(train_holdout=...)) — the unbiased
# estimate of the retest protocol's quantity.
# Targets: coreness5k_s53 frozen-S 0.880 +/- 0.047; density250_s52
# frozen-S 0.948 +/- 0.018. HARVEST FINAL lines promptly.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

python -u scripts/seed_avg_search.py -task coreness5k_s53 -property coreness \
  -channels auto -objective holdout -trials 56 -hpo_seeds 2 \
  -search_epochs 120 -retest_epochs 120 -n 5000 -gen_seed 53

python -u scripts/seed_avg_search.py -task density250_s52 -property density \
  -channels auto -objective holdout -trials 56 -hpo_seeds 3 \
  -search_epochs 200 -retest_epochs 500 -gen_seed 52

echo "=== ROUND4 QUEUE3 DONE ($(date)) ==="
