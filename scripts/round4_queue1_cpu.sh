#!/bin/bash
# Round-4 CPU queue #1 (VERDICT r3 task 1): channel-subset-aware
# seed-averaged searches on BOTH documented search-loses-to-frozen
# instances. Done = searched winner >= frozen-S on coreness5k_s53
# (0.880 +/- 0.047) and density250_s52 (0.948 +/- 0.018).
#
# Stage 1: coreness5k_s53 — round 3's pinned-NSP search landed 0.612;
#   the frozen per-channel sweep showed S-alone dominates (S 0.880 /
#   N 0.488 / P 0.512 / all 0.572). The subset is now IN the space
#   (-channels auto, stratified startup, conditional subspaces).
#   Same 120-epoch protocol as queue9/queue13 for apples-to-apples.
# Stage 2: density250_s52 — round 3's pinned-S search SATURATED (k=2
#   seed-avg best-val 1.0) and retested 0.900 < frozen 0.948. Fixes:
#   -objective f1_auroc (continuous, de-saturates TPE) + hpo_seeds 3.
# HARVEST the FINAL lines into RESULTS.md promptly (driver clean wipes
# data/ and logs/ between sessions).
set -x
cd /root/repo
export PYTHONPATH=/root/repo

python -u scripts/seed_avg_search.py -task coreness5k_s53 -property coreness \
  -channels auto -trials 56 -hpo_seeds 2 -search_epochs 120 \
  -retest_epochs 120 -n 5000 -gen_seed 53

python -u scripts/seed_avg_search.py -task density250_s52 -property density \
  -channels auto -trials 56 -hpo_seeds 3 -objective f1_auroc \
  -search_epochs 200 -retest_epochs 500 -gen_seed 52

echo "=== ROUND4 QUEUE1 DONE ($(date)) ==="
