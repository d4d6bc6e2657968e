#!/bin/bash
# Round-5 TPU queue #8: within-instance searched-vs-frozen comparison on
# the byte-stable PPI-BP stand-in. The round-5 "searched 0.713 vs frozen
# 0.357" rows came from DIFFERENT draws (the searched ran on a round-5
# salted-hash draw that is gone; the frozen row was round-4's draw) —
# both sides rerun here on the crc32 draw, 10-seed x 200-epoch test
# protocol each. ppi_bp keeps GIN embeddings (avg degree ~37, below the
# auto-gcn threshold; round-4-style behavior preserved). Waits on
# queue7's pid.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p logs

if [ -f /tmp/queue_r5_7.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5_7.pid)" 2>/dev/null; do sleep 60; done
fi

python -u scripts/make_real_standins.py -tasks ppi_bp --emb -emb_epochs 10

python -u - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
from subgnn_tpu.cli.test import run_seeds
for name, hp in [
    ("frozen-ref",
     "/root/reference/best_model_hyperparameters/ppi_bp/hyperparams.json"),
    ("searched-rehearsal16",
     "configs/best/ppi_bp_seedavg_S_rehearsal16_hyperparams.json"),
]:
    r = run_seeds("ppi_bp", "data", hp, n_seeds=10,
                  out_dir=f"data/results/ppi_bp_crc32_{name}_10seeds")
    print("FINAL " + json.dumps({
        "instance": "ppi_bp (crc32 draw)", "config": f"{name} (10-seed protocol)",
        "micro_f1_mean": r["micro_f1_mean"], "micro_f1_sd": r["micro_f1_sd"],
        "auroc_mean": r["auroc_mean"], "auroc_sd": r["auroc_sd"]}),
        flush=True)
EOF
echo "=== ROUND5 QUEUE8 DONE ($(date)) ==="
