#!/bin/bash
# Round-5 CPU queue #1: ADJUDICATE coreness search-vs-frozen (VERDICT r4
# task 1 — BOTH branches) + measure the TPE fix on real objectives
# (task 7). Sequential stages:
#
#  1. frozen-S control, r5 era (the bar; instance data survives this
#     session, regenerates byte-stable if wiped)
#  2. ATTEMPT 5: fixed TPE (uniform-prior KDE + bound reflection), 48
#     trials, holdout objective, first-seed racing, 5 finalists —
#     re-ranked on FRESH GENERATOR DRAWS s100/s103 (both scanned at
#     val+test ceiling 1.00, /tmp/coreness_fresh_scan.log round 5)
#     instead of the within-instance holdout whose config-specific
#     holdout->test bias (~0.15) inverted attempt 4's top.
#  3. frozen-S calibration on the SAME fresh draws (what does the rerank
#     metric read for the reference config? — needed to interpret 2.)
#  4. REFERENCE-PROTOCOL CONTROL: the reference's own protocol shape —
#     single-seed best-val objective, 50 trials, TPE, no racing/rerank
#     (train_config.py:266-273, config_files/README.md:27) — on the
#     same instance. If IT also lands below frozen-S, the gap converts
#     into a documented protocol-ceiling parity claim.
#  5. TPE dedup stats on all three study files (pre-fix attempt 4 vs
#     post-fix attempt 5 + refproto).
#
# HARVEST: scripts/harvest_watchdog.sh snapshots study.json + results +
# FINAL lines every 5 min into tracked harvest/. Commit RESULTS.md rows
# the moment finals appear.
set -x
cd /root/repo
export PYTHONPATH=/root/repo
mkdir -p logs

python -u - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from subgnn_tpu.cli.prepare_dataset import prepare
from subgnn_tpu.cli.test import run_seeds

d = Path("data/coreness5k_s53")
if not (d / "gin_embeddings.npy").exists():
    prepare(d, "coreness", seed=53, emb_epochs=100,
            generate_graph=not (d / "subgraphs.pth").exists(),
            n=5000, n_subgraphs=250, n_subgraph_nodes=20)
r = run_seeds("coreness5k_s53", "data",
              "/root/reference/best_model_hyperparameters/coreness/S_coreness_hyperparams.json",
              n_seeds=10, out_dir="data/results/coreness5k_s53_Sref_10seeds_r5")
print("FINAL " + json.dumps({
    "instance": "coreness5k_s53", "config": "frozen-ref-S control (r5 era)",
    "micro_f1_mean": r["micro_f1_mean"], "micro_f1_sd": r["micro_f1_sd"]}),
    flush=True)
EOF

# stage 2: attempt 5 — fixed TPE + fresh-draw finalist rerank
python -u scripts/seed_avg_search.py -task coreness5k_s53 -property coreness \
  -channels S -objective holdout -trials 48 -hpo_seeds 2 -race_margin 0.10 \
  -finalists 5 -finalist_seeds 4 -fresh_draws 100,103 -tag e200a5 \
  -search_epochs 200 -retest_epochs 200 -n 5000 -gen_seed 53

# stage 3: frozen-S calibration on the same fresh draws (rerank metric)
python -u - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from pathlib import Path
from subgnn_tpu.config import HParams, RunConfig
from subgnn_tpu.train.runner import SubGNNPipeline

frozen = json.loads(Path(
    "/root/reference/best_model_hyperparameters/coreness/"
    "S_coreness_hyperparams.json").read_text())
vals = []
for g in (100, 103):
    rc = RunConfig(task=f"coreness5k_s53_fd{g}", project_root=Path("data"))
    for s in (100, 101):
        hp = HParams.from_dict({**frozen, "max_epochs": 200, "seed": s})
        out = SubGNNPipeline(rc, hp).run(log_fn=None)
        vals.append(float(out["best_monitor"]))
        print(f"frozen-S fd{g} seed {s}: best-val {vals[-1]:.4f}", flush=True)
print("FINAL " + json.dumps({
    "config": "frozen-ref-S fresh-draw calibration (fd100+fd103, 200ep)",
    "rerank_metric_mean": float(np.mean(vals)),
    "per_run": [round(v, 4) for v in vals]}), flush=True)
EOF

# stage 4: reference-protocol control (single-seed best-val, 50 trials)
python -u scripts/seed_avg_search.py -task coreness5k_s53 -property coreness \
  -channels S -objective f1 -trials 50 -hpo_seeds 1 -race_margin 0 \
  -finalists 0 -tag refproto \
  -search_epochs 200 -retest_epochs 200 -n 5000 -gen_seed 53

# stage 5: TPE pathology metrics, pre-fix vs post-fix, real objectives
python -u scripts/tpe_dedup_stats.py \
  harvest/coreness5k_s53_seedavg_S_e200a4/study.json \
  data/tb/coreness5k_s53_seedavg_S_e200a5/study.json \
  data/tb/coreness5k_s53_seedavg_S_refproto/study.json

echo "=== ROUND5 QUEUE1 DONE ($(date)) ==="
