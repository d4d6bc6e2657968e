#!/bin/bash
# Snapshot in-flight search/eval state from gitignored data/ + logs/ into
# the TRACKED harvest/ dir every 5 minutes. The between-session clean
# removes every gitignored path (round-3 queue4's finished searches were
# wiped before harvest — CLAUDE.md queue hygiene); tracked files survive
# via the driver's end-of-session commit. Resuming a study in round 5 is
# then: copy harvest/<study>/study.json back into data/tb/<study>/ after
# regenerating the (seeded, byte-stable) instance.
set -u
cd /root/repo
mkdir -p harvest
while true; do
  for s in data/tb/*seedavg*/study.json; do
    [ -f "$s" ] || continue
    d="harvest/$(basename "$(dirname "$s")")"
    mkdir -p "$d"
    cp -f "$s" "$d/study.json" 2>/dev/null
  done
  for r in data/results/*/experiment_results.json; do
    [ -f "$r" ] || continue
    d="harvest/results_$(basename "$(dirname "$r")")"
    mkdir -p "$d"
    cp -f "$r" "$d/experiment_results.json" 2>/dev/null
  done
  for q in logs/queue*.log; do
    [ -f "$q" ] && grep -a "^FINAL\|^RERANK\|^BEST:\|^TPE_DEDUP\|^SCAN_" "$q" \
      > "harvest/$(basename "$q" .log)_finals.txt" 2>/dev/null
  done
  sleep 300
done
