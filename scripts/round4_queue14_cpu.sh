#!/bin/bash
# Round-4 CPU queue #14 (session restart of queue12 + the density half of
# VERDICT r3 task 1). data/ was wiped at the session boundary, so each
# stage regenerates its instance (all generation is seeded) and RE-RUNS
# the frozen-S control in the same era so searched-vs-frozen is
# apples-to-apples on the regenerated instance+embedding draw.
#
#  1. coreness5k_s53: regenerate, frozen-S control (200ep x 10 seeds),
#     then pinned-S seed-avg search attempt 4 (48 trials, holdout
#     objective, finalist rerank, 200-epoch protocol).
#  2. density250_s52: regenerate via the instance scan, frozen-S control
#     (500ep x 10 seeds, the protocol of the 0.948 closure), then
#     pinned-S search with retest at 500 epochs.
#
# HARVEST every FINAL line into RESULTS.md the moment it appears.
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

task_dir = Path("data/coreness5k_s53")
if not (task_dir / "subgraphs.pth").exists():
    prepare(task_dir, "coreness", seed=53, emb_epochs=100,
            n=5000, n_subgraphs=250, n_subgraph_nodes=20)
r = run_seeds("coreness5k_s53", "data",
              "/root/reference/best_model_hyperparameters/coreness/S_coreness_hyperparams.json",
              n_seeds=10, out_dir="data/results/coreness5k_s53_Sref_10seeds_r4")
print("FINAL " + json.dumps({
    "instance": "coreness5k_s53", "config": "frozen-ref-S control (r4 era)",
    "micro_f1_mean": r["micro_f1_mean"], "micro_f1_sd": r["micro_f1_sd"]}),
    flush=True)
EOF

python -u scripts/seed_avg_search.py -task coreness5k_s53 -property coreness \
  -channels S -objective holdout -trials 48 -hpo_seeds 2 \
  -finalists 5 -finalist_seeds 4 -tag e200a4 \
  -search_epochs 200 -retest_epochs 200 -n 5000 -gen_seed 53

python -u scripts/density_instance_scan.py -seeds 52:53 -keep_top 1 \
  -property density

python -u - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from subgnn_tpu.cli.test import run_seeds

r = run_seeds("density250_s52", "data",
              "/root/reference/best_model_hyperparameters/density/S_density_hyperparams.json",
              n_seeds=10, max_epochs=500,
              out_dir="data/results/density250_s52_Sref_500ep_10seeds_r4")
print("FINAL " + json.dumps({
    "instance": "density250_s52", "config": "frozen-ref-S 500ep control (r4 era)",
    "micro_f1_mean": r["micro_f1_mean"], "micro_f1_sd": r["micro_f1_sd"]}),
    flush=True)
EOF

python -u scripts/seed_avg_search.py -task density250_s52 -property density \
  -channels S -objective holdout -trials 48 -hpo_seeds 2 \
  -finalists 5 -finalist_seeds 4 -tag e500a1 \
  -search_epochs 200 -retest_epochs 500 -n 1000 -gen_seed 52

echo "=== ROUND4 QUEUE14 DONE ($(date)) ==="
