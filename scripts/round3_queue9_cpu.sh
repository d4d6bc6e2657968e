#!/bin/bash
# Round-3 CPU queue #9 (chained after queue6): per-instance seed-averaged
# search on the PERFECT-ceiling coreness instance (s53). The seed-42
# winner config does NOT transfer to this draw (queue8: ~0.58 vs 0.812 on
# its home instance) — matching the paper's methodology (per-instance
# 50-trial HPO) means searching THIS instance. Channels pinned to NSP
# (the home-instance winner's subset). HARVEST FINAL promptly.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

# re-chained (2026-08-19): waits on queue5 directly; queue6's final
# density-s52 search stage moved to queue10 AFTER this (s52 already beats
# paper with the frozen config — its search is the lower-priority job)
Q5_PID=$(cat logs/queue5.pid 2>/dev/null)
# a missing/empty pid file must NOT mean "start now": two jobs on one
# chip crashed the TPU worker once (CLAUDE.md). Refuse instead.
[ -n "$Q5_PID" ] || { echo "no logs/queue5.pid — refusing concurrent start"; exit 1; }
while kill -0 "$Q5_PID" 2>/dev/null; do sleep 30; done

# retest at 120 epochs = the home-instance protocol that produced 0.812
# (the tracked winner's own max_epochs), keeping the comparison apples-to-
# apples and the 10-seed CPU retest tractable at 5k nodes
python -u scripts/seed_avg_search.py -task coreness5k_s53 -property coreness \
  -channels NSP -trials 40 -hpo_seeds 2 -search_epochs 120 \
  -retest_epochs 120 -n 5000
echo "=== ROUND3 QUEUE9 DONE ($(date)) ==="
