#!/bin/bash
# Round-5 TPU queue #7: structure-labeled multilabel rehearsal, take 2.
# queue6 was killed mid-run after forensics showed its 10-epoch GIN
# pretrain never left its saturated init on the BA-m=222 hpo surrogate
# (link val_auc exactly 0.500, row norms ~3400 -> LSTM saturation ->
# every config collapses to label marginals; a linear probe on the
# precomputed gamma_S sim vectors reaches val AUROC 0.744, so the
# instance itself has selection-accessible signal — RESULTS.md round 5).
# gcn (reference conv_type option, selected by the reference's own
# link-pred val-AUC criterion) trains to 0.717 in the same 10 epochs.
# The bench preflight from queue6 (294.3M edges/s bf16) stands.
# Sims are degree-sequence DTW — embedding-independent — so the cached
# similarities/ from queue6's draw are reused as-is.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p logs

rm -f data/hpo_neuro_sl/gin_embeddings.npy data/hpo_neuro_sl/gin_embeddings.pth
python -u scripts/make_real_standins.py -tasks hpo_neuro -labels structure \
  -suffix _sl --emb -emb_epochs 10 -emb_conv auto

# in-era frozen baseline on this draw (10-seed test protocol).
# FINAL line carries AUROC too: on multilabel stand-ins micro-F1 alone is
# indistinguishable from constant-prediction collapse (round-5 forensics).
python -u - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
from subgnn_tpu.cli.test import run_seeds
r = run_seeds("hpo_neuro_sl", "data",
              "/root/reference/best_model_hyperparameters/hpo_neuro/hyperparams.json",
              n_seeds=10, out_dir="data/results/hpo_neuro_sl_frozen_10seeds")
print("FINAL " + json.dumps({
    "instance": "hpo_neuro_sl", "config": "frozen-ref (10-seed protocol)",
    "micro_f1_mean": r["micro_f1_mean"], "micro_f1_sd": r["micro_f1_sd"],
    "auroc_mean": r["auroc_mean"], "auroc_sd": r["auroc_sd"]}),
    flush=True)
EOF

t0=$(date +%s)
python -u scripts/seed_avg_search.py -task hpo_neuro_sl -property density \
  -channels S -objective holdout_f1auroc -trials 6 -hpo_seeds 2 \
  -race_margin 0.10 -finalists 2 -finalist_seeds 4 -tag rehearsal6sl \
  -platform tpu -search_epochs 200 -retest_epochs 200 -retest_seeds 10
t1=$(date +%s)
echo "FINAL {\"rehearsal\": \"hpo_neuro_sl_multilabel_search6_tpu\", \"wall_s\": $((t1-t0))}"
echo "=== ROUND5 QUEUE7 DONE ($(date)) ==="
