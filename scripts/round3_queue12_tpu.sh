#!/bin/bash
# Round-3 TPU queue #12: frozen-ref-P component control on the FRESH
# perfect-ceiling draw the scan kept (component250_s46 — every component
# draw has ceiling 1.00, cc labels cannot drift). A fifth instance draw
# for the "frozen-P beats paper on every draw" claim. HARVEST promptly.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

python -u - <<'EOF'
import json, sys
from pathlib import Path
sys.path.insert(0, "/root/repo")
from subgnn_tpu.cli.prepare_dataset import prepare
from subgnn_tpu.cli.test import run_seeds

task, seed = "component250_s46", 46
d = Path("data") / task
if not (d / "gin_embeddings.npy").exists():
    prepare(d, "cc", seed=seed, generate_graph=False,
            conv="gin", emb_dim=64, emb_epochs=100)
cfg = "/root/reference/best_model_hyperparameters/component/P_component_hyperparams.json"
r = run_seeds(task, "data", cfg, n_seeds=10, max_epochs=500,
              out_dir=f"data/results/{task}_Pref_500ep_10seeds")
print("FINAL " + json.dumps({
    "instance": task, "gen_seed": seed, "config": "frozen-ref-P",
    "epochs": 500, "oracle_test_acc": 1.0,
    "micro_f1_mean": r["micro_f1_mean"],
    "micro_f1_sd": r["micro_f1_sd"]}), flush=True)
EOF
echo "=== ROUND3 QUEUE12 DONE ($(date)) ==="
