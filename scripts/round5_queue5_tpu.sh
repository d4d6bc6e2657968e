#!/bin/bash
# Round-5 TPU queue #5: multilabel search rehearsal on the
# STRUCTURE-LABELED HPO-NEURO stand-in (data/hpo_neuro_sl — labels are
# induced-subgraph internal density/degree bins, i.e. learnable by
# gamma_S, unlike the degree-quantile labels that pinned every config at
# AUROC 0.500). Also runs the frozen reference config's in-era 10-seed
# baseline on the same draw so searched-vs-frozen is a within-instance
# comparison. Waits for queue4 (the flow-only rehearsal) to release the
# chip.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p logs

if [ -f /tmp/queue_r5_4.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5_4.pid)" 2>/dev/null; do sleep 60; done
fi

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
echo "=== ROUND5 QUEUE5 DONE ($(date)) ==="
