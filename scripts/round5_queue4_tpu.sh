#!/bin/bash
# Round-5 TPU queue #4: search-protocol rehearsal on the MULTILABEL
# stand-in (HPO-NEURO: 14.6k nodes / ~3.2M edges / 4,000 subgraphs / 10
# labels, multilabel) — queue2's PPI-BP rehearsal covered the
# single-label path only; the BCE-multilabel objective + binarizer flow
# through search/racing/rerank/retest is a distinct path worth
# exercising at scale before real data lands.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p logs

python -u scripts/make_real_standins.py -tasks hpo_neuro --emb -emb_epochs 10

t0=$(date +%s)
# 200 search epochs: at 100 the multilabel micro-F1 is still 0.0 for
# every config (thresholded sigmoid all-below-0.5 — measured, first
# launch of this queue), giving the sampler no signal; the frozen
# rehearsal needed 200 epochs to reach its 0.214
python -u scripts/seed_avg_search.py -task hpo_neuro -property density \
  -channels S -objective holdout_f1auroc -trials 6 -hpo_seeds 2 -race_margin 0.10 \
  -finalists 2 -finalist_seeds 4 -tag rehearsal6au -platform tpu \
  -search_epochs 200 -retest_epochs 200 -retest_seeds 10
t1=$(date +%s)
echo "FINAL {\"rehearsal\": \"hpo_neuro_multilabel_search6_tpu\", \"wall_s\": $((t1-t0))}"
echo "=== ROUND5 QUEUE4 DONE ($(date)) ==="
