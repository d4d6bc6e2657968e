#!/bin/bash
# Round-3 CPU queue #1 (sequential; one process at a time — queue hygiene
# per CLAUDE.md). Density per-channel sweep (VERDICT task 1) then the
# bf16 parity sweep (VERDICT task 6). All CPU — safe to run alongside
# TPU work (different process, jax pinned to cpu inside the scripts).
set -x
cd /root/repo
export PYTHONPATH=/root/repo
python -u scripts/density_channel_sweep.py -gen_seeds 42,44,45 -channels N,P,all
python -u scripts/bf16_parity_sweep.py
echo "=== ROUND3 QUEUE1 DONE ($(date)) ==="
