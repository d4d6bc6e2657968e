#!/bin/bash
# Round-3 CPU queue #10 (chained after queue9): seed-averaged deep search
# on density250_s52 — the perfect-ceiling instance where the frozen-ref-S
# config already beats the paper (0.948 vs 0.919). This search asks how
# much per-instance HPO adds ON TOP of the closure; it is the round's
# lowest-priority job and deliberately runs last. HARVEST FINAL promptly.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

Q9_PID=$(cat logs/queue9.pid 2>/dev/null)
# a missing/empty pid file must NOT mean "start now": two jobs on one
# chip crashed the TPU worker once (CLAUDE.md). Refuse instead.
[ -n "$Q9_PID" ] || { echo "no logs/queue9.pid — refusing concurrent start"; exit 1; }
# guard against PID recycling: only wait while the PID is still a python
# process (the predecessor), not some unrelated long-lived reuse of it
while [ "$(ps -o comm= -p "$Q9_PID" 2>/dev/null)" = "python" ]; do sleep 30; done

python -u scripts/seed_avg_search.py -task density250_s52 -property density \
  -channels S -trials 25 -hpo_seeds 2 -search_epochs 150
echo "=== ROUND3 QUEUE10 DONE ($(date)) ==="
