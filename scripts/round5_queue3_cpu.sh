#!/bin/bash
# Round-5 CPU queue #3: the closing measurement of the coreness
# adjudication. Attempt 5 (fixed TPE + fresh-draw rerank) selected
# trial-6 again: holdout 0.9875, fresh-draw best-val 0.980 vs frozen-S's
# 1.000 — every selection metric saturates at its ceiling — yet its s53
# TEST retest is 0.844 vs frozen 0.908 (25-example split, gap = 1.6
# examples). If trial-6 ~= frozen-S on the FRESH instances' full 10-seed
# TEST protocol, the s53 gap is split luck, not config quality, and the
# adjudication closes as a protocol-ceiling parity claim.
# Waits for queue1 (refproto control) to release the CPU.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

if [ -f /tmp/queue_r5_1.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5_1.pid)" 2>/dev/null; do sleep 60; done
fi

python -u - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from subgnn_tpu.cli.test import run_seeds

FROZEN = ("/root/reference/best_model_hyperparameters/coreness/"
          "S_coreness_hyperparams.json")
TRIAL6 = "configs/best/coreness5k_s53_seedavg_S_e200a5_hyperparams.json"
for inst in ("coreness5k_s53_fd100", "coreness5k_s53_fd103"):
    for name, cfg in (("frozen-ref-S", FROZEN), ("trial6-searched", TRIAL6)):
        r = run_seeds(inst, "data", cfg, n_seeds=10,
                      out_dir=f"data/results/{inst}_{name}_10seeds")
        print("FINAL " + json.dumps({
            "instance": inst, "config": name + " (10-seed test protocol)",
            "micro_f1_mean": r["micro_f1_mean"],
            "micro_f1_sd": r["micro_f1_sd"]}), flush=True)
EOF
echo "=== ROUND5 QUEUE3 DONE ($(date)) ==="
