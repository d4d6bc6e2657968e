#!/bin/bash
# Round-5 queue #8b: trimmed within-instance searched-vs-frozen on the
# byte-stable PPI-BP stand-in (5 seeds/side x 200 epochs instead of
# queue8's 10 — sized to the session's remaining chip window; same
# comparison, wider error bars). See round5_queue8_tpu.sh for the full
# protocol to run when chip time is unconstrained.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p logs

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
    r = run_seeds("ppi_bp", "data", hp, n_seeds=5,
                  out_dir=f"data/results/ppi_bp_crc32_{name}_5seeds")
    print("FINAL " + json.dumps({
        "instance": "ppi_bp (crc32 draw)", "config": f"{name} (5-seed protocol)",
        "micro_f1_mean": r["micro_f1_mean"], "micro_f1_sd": r["micro_f1_sd"],
        "auroc_mean": r["auroc_mean"], "auroc_sd": r["auroc_sd"]}),
        flush=True)
EOF
echo "=== ROUND5 QUEUE8B DONE ($(date)) ==="
