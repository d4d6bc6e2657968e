#!/bin/bash
# Round-5 TPU queue #6: restart of queue5's work after the 2026-08-20
# session boundary wiped data/ before either of queue4/queue5 completed.
# Sequential (one chip, one queue — CLAUDE.md queue hygiene):
#   1. bench.py preflight (fresh-era throughput pin)
#   2. regenerate the structure-labeled HPO-NEURO stand-in (byte-stable
#      post-crc32 fix; labels are induced-subgraph internal density/
#      degree bins — learnable by gamma_S, unlike degree quantiles)
#   3. in-era frozen-reference 10-seed baseline on that draw
#   4. 6-trial multilabel seed_avg_search rehearsal + rerank + retest
# The degree-label flow-only rehearsal (old queue4) is SUPERSEDED: its
# labels are proven unlearnable (AUROC pinned at 0.500 for every config,
# RESULTS.md round-5 forensics), so a search over it measures only
# wall-clock, which queue2's PPI-BP rehearsal already pinned (62.6 min).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p logs

echo "=== bench preflight ==="
python -u bench.py

python -u scripts/make_real_standins.py -tasks hpo_neuro -labels structure \
  -suffix _sl --emb -emb_epochs 10

# in-era frozen baseline on this draw (10-seed test protocol)
python -u - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
from subgnn_tpu.cli.test import run_seeds
r = run_seeds("hpo_neuro_sl", "data",
              "/root/reference/best_model_hyperparameters/hpo_neuro/hyperparams.json",
              n_seeds=10, out_dir="data/results/hpo_neuro_sl_frozen_10seeds")
print("FINAL " + json.dumps({
    "instance": "hpo_neuro_sl", "config": "frozen-ref (10-seed protocol)",
    "micro_f1_mean": r["micro_f1_mean"], "micro_f1_sd": r["micro_f1_sd"]}),
    flush=True)
EOF

t0=$(date +%s)
python -u scripts/seed_avg_search.py -task hpo_neuro_sl -property density \
  -channels S -objective holdout_f1auroc -trials 6 -hpo_seeds 2 \
  -race_margin 0.10 -finalists 2 -finalist_seeds 4 -tag rehearsal6sl \
  -platform tpu -search_epochs 200 -retest_epochs 200 -retest_seeds 10
t1=$(date +%s)
echo "FINAL {\"rehearsal\": \"hpo_neuro_sl_multilabel_search6_tpu\", \"wall_s\": $((t1-t0))}"
echo "=== ROUND5 QUEUE6 DONE ($(date)) ==="
