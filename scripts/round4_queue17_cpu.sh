#!/bin/bash
# Round-4 CPU queue #17: the density250_s52 frozen-S 500-epoch control.
# queue14's inline control heredoc crashes (the instance scan leaves a
# graph-only dir, review finding); the search stage self-heals via the
# fixed seed_avg_search prepare guard, but the control needs this re-run.
# Gated on queue14's log SENTINEL (not its PID — PID recycling can wedge
# a waiter forever, ADVICE r3).
set -x
cd /root/repo
export PYTHONPATH=/root/repo

while ! grep -q "ROUND4 QUEUE14 DONE" logs/queue_r4_14.log 2>/dev/null; do
  sleep 60
done

python -u - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from subgnn_tpu.cli.prepare_dataset import prepare
from subgnn_tpu.cli.test import run_seeds

d = Path("data/density250_s52")
if not (d / "gin_embeddings.npy").exists():  # self-heal (seeded, stable)
    prepare(d, "density", seed=52,
            generate_graph=not (d / "subgraphs.pth").exists(),
            conv="gin", emb_dim=64, emb_epochs=100,
            n=1000, n_subgraphs=250, n_subgraph_nodes=20)
r = run_seeds("density250_s52", "data",
              "/root/reference/best_model_hyperparameters/density/S_density_hyperparams.json",
              n_seeds=10, max_epochs=500,
              out_dir="data/results/density250_s52_Sref_500ep_10seeds_r4")
print("FINAL " + json.dumps({
    "instance": "density250_s52", "config": "frozen-ref-S 500ep control (r4 era)",
    "micro_f1_mean": r["micro_f1_mean"], "micro_f1_sd": r["micro_f1_sd"]}),
    flush=True)
EOF
echo "=== ROUND4 QUEUE17 DONE ($(date)) ==="
