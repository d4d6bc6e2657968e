#!/bin/bash
# Round-5 CPU queue #1: coreness5k_s53 pinned-S search, ATTEMPT 5 — first
# attempt with the fixed TPE (uniform-prior KDE + bound reflection;
# attempt 4 burned ~20 of 48 trials on one boundary-atom duplicate).
# Fresh tag so the fixed sampler starts from a clean history; racing ON
# (first-seed racing saves ~40% on clearly-losing configs). Also re-runs
# the in-era frozen-S control first: the bar moves with the regenerated
# instance draw (0.880 round 3 -> 0.908 round 4 session 2).
# HARVEST FINAL lines into RESULTS.md promptly.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

python -u - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from subgnn_tpu.cli.prepare_dataset import prepare
from subgnn_tpu.cli.test import run_seeds

d = Path("data/coreness5k_s53")
if not (d / "gin_embeddings.npy").exists():
    prepare(d, "coreness", seed=53, emb_epochs=100,
            generate_graph=not (d / "subgraphs.pth").exists(),
            n=5000, n_subgraphs=250, n_subgraph_nodes=20)
r = run_seeds("coreness5k_s53", "data",
              "/root/reference/best_model_hyperparameters/coreness/S_coreness_hyperparams.json",
              n_seeds=10, out_dir="data/results/coreness5k_s53_Sref_10seeds_r5")
print("FINAL " + json.dumps({
    "instance": "coreness5k_s53", "config": "frozen-ref-S control (r5 era)",
    "micro_f1_mean": r["micro_f1_mean"], "micro_f1_sd": r["micro_f1_sd"]}),
    flush=True)
EOF

python -u scripts/seed_avg_search.py -task coreness5k_s53 -property coreness \
  -channels S -objective holdout -trials 48 -hpo_seeds 2 -race_margin 0.10 \
  -finalists 5 -finalist_seeds 4 -tag e200a5 \
  -search_epochs 200 -retest_epochs 200 -n 5000 -gen_seed 53
echo "=== ROUND5 QUEUE1 DONE ($(date)) ==="
