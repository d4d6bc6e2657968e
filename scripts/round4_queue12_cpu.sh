#!/bin/bash
# Round-4 CPU queue #12: pinned-S holdout search on coreness5k_s53 —
# attempt 4. The auto searches converge on S but under-optimize within it
# (best S-trial holdout 0.90 vs frozen-S 0.969 under the same estimator,
# ~12/64 trials in-arm). All 48 trials in the S subspace, 200-epoch
# protocol, finalist rerank. Waits for queue8.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

P=$(cat logs/queue_r4_8.pid 2>/dev/null)
[ -n "$P" ] || { echo "no queue_r4_8.pid — refusing concurrent start"; exit 1; }
while [ "$(ps -o comm= -p "$P" 2>/dev/null)" = "bash" ]; do sleep 60; done

python -u scripts/seed_avg_search.py -task coreness5k_s53 -property coreness \
  -channels S -objective holdout -trials 48 -hpo_seeds 2 \
  -finalists 5 -finalist_seeds 4 -tag e200 \
  -search_epochs 200 -retest_epochs 200 -n 5000 -gen_seed 53
echo "=== ROUND4 QUEUE12 DONE ($(date)) ==="
