#!/bin/bash
# Round-3 CPU queue #6: density on a TARGETED high-ceiling fresh instance
# (VERDICT r2 task 1, the part the emb-draw scan could not address).
# Waits for the instance-ceiling scan, fully prepares the top-2 winners
# (embeddings seeded by the instance's generator seed — the embedding draw
# is part of the instance), runs the frozen-reference-S 10-seed 500-epoch
# protocol on each, then (after queue5 frees the CPU) a seed-averaged deep
# search on the best winner. HARVEST FINAL lines into RESULTS.md promptly.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

SCAN_PID=$(cat logs/density_scan.pid 2>/dev/null)
[ -n "$SCAN_PID" ] || { echo "no logs/density_scan.pid — refusing concurrent start"; exit 1; }
while kill -0 "$SCAN_PID" 2>/dev/null; do sleep 15; done

python -u - <<'EOF'
import json, re, sys
from pathlib import Path
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
from subgnn_tpu.cli.prepare_dataset import prepare
from subgnn_tpu.cli.test import run_seeds

S_CFG = "/root/reference/best_model_hyperparameters/density/S_density_hyperparams.json"
log = Path("logs/density_scan.log").read_text()
final = json.loads(re.search(r"^SCAN_FINAL (.*)$", log, re.M).group(1))
winners = final["winners"]
print("winners:", json.dumps(winners), flush=True)

for w in winners:
    task, seed = w["task"], w["seed"]
    d = Path("data") / task
    if not (d / "gin_embeddings.npy").exists():
        prepare(d, "density", seed=seed, generate_graph=False,
                conv="gin", emb_dim=64, emb_epochs=100)
    r = run_seeds(task, "data", S_CFG, n_seeds=10, max_epochs=500,
                  out_dir=f"data/results/{task}_Sref_500ep_10seeds")
    print("FINAL " + json.dumps({
        "instance": task, "gen_seed": seed, "config": "frozen-ref-S",
        "epochs": 500, "oracle_test_acc": w["oracle_test_acc"],
        "micro_f1_mean": r["micro_f1_mean"],
        "micro_f1_sd": r["micro_f1_sd"]}), flush=True)
EOF

# deep seed-averaged search on the best winner once queue5's searches end
Q5_PID=$(cat logs/queue5.pid 2>/dev/null)
# a missing/empty pid file must NOT mean "start now": two jobs on one
# chip crashed the TPU worker once (CLAUDE.md). Refuse instead.
[ -n "$Q5_PID" ] || { echo "no logs/queue5.pid — refusing concurrent start"; exit 1; }
while kill -0 "$Q5_PID" 2>/dev/null; do sleep 30; done
WINNER=$(python -c "
import json, re
from pathlib import Path
log = Path('logs/density_scan.log').read_text()
final = json.loads(re.search(r'^SCAN_FINAL (.*)$', log, flags=8).group(1))
print(final['winners'][0]['task'])")
python -u scripts/seed_avg_search.py -task "$WINNER" -property density -channels S -trials 25 -hpo_seeds 2 -search_epochs 150
echo "=== ROUND3 QUEUE6 DONE ($(date)) ==="
