#!/bin/bash
# Round-3 TPU queue #7: frozen-ref-S 500-epoch 10-seed protocol on the
# PERFECT-ceiling cut_ratio instance the scan found (seed 64: oracle
# val 1.00 / test 1.00). Runs on the real chip (fused-epoch mode) because
# the CPU is saturated by queues 5/6; ONE TPU process at a time.
# HARVEST the FINAL line into RESULTS.md promptly (session-boundary wipe).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

python -u - <<'EOF'
import json, sys
from pathlib import Path
sys.path.insert(0, "/root/repo")
from subgnn_tpu.cli.prepare_dataset import prepare
from subgnn_tpu.cli.test import run_seeds

task, seed = "cutratio250_s64", 64
d = Path("data") / task
if not (d / "gin_embeddings.npy").exists():
    prepare(d, "cut_ratio", seed=seed, generate_graph=False,
            conv="gin", emb_dim=64, emb_epochs=100)
cfg = "/root/reference/best_model_hyperparameters/cutratio/S_cutratio_hyperparams.json"
r = run_seeds(task, "data", cfg, n_seeds=10, max_epochs=500,
              out_dir=f"data/results/{task}_Sref_500ep_10seeds")
print("FINAL " + json.dumps({
    "instance": task, "gen_seed": seed, "config": "frozen-ref-S",
    "epochs": 500, "oracle_test_acc": 1.0,
    "micro_f1_mean": r["micro_f1_mean"],
    "micro_f1_sd": r["micro_f1_sd"]}), flush=True)
EOF
echo "=== ROUND3 QUEUE7 DONE ($(date)) ==="
