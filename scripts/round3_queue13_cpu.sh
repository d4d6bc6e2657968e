#!/bin/bash
# Round-3 CPU queue #13: per-channel FROZEN-reference sweep on the
# perfect-ceiling coreness instance (s53) — the exact playbook that
# resolved COMPONENT (the winning channel there was not the one first
# tried). Our NSP searches landed 0.61 on s53; the reference's four
# frozen coreness configs (N/S/P/all) are the remaining untried configs.
# HARVEST the FINAL lines promptly.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

python -u - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from subgnn_tpu.cli.test import run_seeds

REF = "/root/reference/best_model_hyperparameters/coreness"
for ch in ("P", "S", "N", "all"):
    r = run_seeds("coreness5k_s53", "data", f"{REF}/{ch}_coreness_hyperparams.json",
                  n_seeds=10,
                  out_dir=f"data/results/coreness5k_s53_{ch}ref_10seeds")
    print("FINAL " + json.dumps({
        "instance": "coreness5k_s53", "config": f"frozen-ref-{ch}",
        "micro_f1_mean": r["micro_f1_mean"],
        "micro_f1_sd": r["micro_f1_sd"]}), flush=True)
EOF
echo "=== ROUND3 QUEUE13 DONE ($(date)) ==="
