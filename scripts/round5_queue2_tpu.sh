#!/bin/bash
# Round-5 TPU queue #2: exercise the SEARCH protocol at real-dataset
# scale (VERDICT r4 task 5). The round-4 dress rehearsals ran only the
# FROZEN configs at published scale; the day real data lands, the full
# protocol is search + 10-seed retest (reference
# config_files/ppi_bp/S_ppi_bp_optuna: 50 trials x 300 epochs,
# monitor val_micro_f1, per-channel) — so rehearse a reduced-budget
# seed_avg_search (16 trials, holdout objective, racing, finalist
# rerank) on the PPI-BP stand-in ON CHIP, measuring wall-clock and the
# artifact flow end-to-end.
#
# Waits for any current chip job to finish first (one chip, one job —
# two processes on the chip crashed the worker in round 3).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p logs

if [ -f /tmp/serving_bench.pid ]; then
  while kill -0 "$(cat /tmp/serving_bench.pid)" 2>/dev/null; do sleep 30; done
fi

# stand-in generation (graph+subgraphs host-side; GIN pretrain on chip)
python -u scripts/make_real_standins.py -tasks ppi_bp --emb -emb_epochs 10

t0=$(date +%s)
python -u scripts/seed_avg_search.py -task ppi_bp -property density \
  -channels S -objective holdout -trials 16 -hpo_seeds 2 -race_margin 0.10 \
  -finalists 3 -finalist_seeds 4 -tag rehearsal16 -platform tpu \
  -search_epochs 100 -retest_epochs 200 -retest_seeds 10
t1=$(date +%s)
echo "FINAL {\"rehearsal\": \"ppi_bp_search16_tpu\", \"wall_s\": $((t1-t0))}"
echo "=== ROUND5 QUEUE2 DONE ($(date)) ==="
