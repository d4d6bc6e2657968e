#!/bin/bash
# Round-4 CPU queue #7: holdout searches WITH two-stage finalist
# re-ranking (winner's-curse fix — the stage queue3 lacked). Both studies
# RESUME from their JSON state: coreness's 56 trials are cached so stage 1
# goes straight to rerank + retest; density completes its partial study
# first. Targets unchanged: coreness5k_s53 >= 0.880, density250_s52 >= 0.948.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

python -u scripts/seed_avg_search.py -task coreness5k_s53 -property coreness \
  -channels auto -objective holdout -trials 56 -hpo_seeds 2 \
  -finalists 6 -finalist_seeds 4 \
  -search_epochs 120 -retest_epochs 120 -n 5000 -gen_seed 53

python -u scripts/seed_avg_search.py -task density250_s52 -property density \
  -channels auto -objective holdout -trials 56 -hpo_seeds 3 \
  -finalists 6 -finalist_seeds 4 \
  -search_epochs 200 -retest_epochs 500 -gen_seed 52

echo "=== ROUND4 QUEUE7 DONE ($(date)) ==="
