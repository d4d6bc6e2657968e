"""bf16-vs-fp32 end-metric parity at the headline frozen configs
(VERDICT round 2, task 6: make bf16 earn default status).

Round 2 showed +18-20%% step throughput for bf16 activations with fp32
master weights, with parity demonstrated only on density x 3 seeds.
This runs the full 10-seed protocol for BOTH dtypes on all four
synthetic tasks at their headline configurations, so RESULTS.md can
carry a complete parity table and the default can be flipped (or not)
with evidence.

Usage (CPU, ~1-1.5 h total):
  PYTHONPATH=/root/repo python scripts/bf16_parity_sweep.py \
      [-tasks density,cutratio,component,coreness5k]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REF = Path("/root/reference/best_model_hyperparameters")
# task -> (instance, property, frozen config, gen kwargs, max_epochs)
# Configs/epochs match the RESULTS.md headline rows so the parity claim
# covers the numbers actually quoted.
TASKS = {
    "density": ("density250", "density",
                REF / "density/S_density_hyperparams.json",
                dict(n=1000, n_subgraphs=250, n_subgraph_nodes=20), None),
    "cutratio": ("cutratio250", "cut_ratio",
                 REF / "cutratio/S_cutratio_hyperparams.json",
                 dict(n=1000, n_subgraphs=250, n_subgraph_nodes=20), 500),
    "component": ("component250", "cc",
                  REF / "component/P_component_hyperparams.json",
                  dict(n=1000, n_subgraphs=250, n_subgraph_nodes=20), 500),
    "coreness5k": ("coreness5k", "coreness",
                   REPO / "configs/best/coreness5k_hyperparams.json",
                   dict(n=5000, n_subgraphs=250, n_subgraph_nodes=20), None),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-tasks", default="density,cutratio,component,coreness5k")
    ap.add_argument("-n_seeds", type=int, default=10)
    ap.add_argument("-project_root", default="data")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from subgnn_tpu.cli.prepare_dataset import prepare
    from subgnn_tpu.cli.test import run_seeds

    for task in args.tasks.split(","):
        task = task.strip()
        if task not in TASKS:
            print(json.dumps({"task": task, "skipped":
                              f"unknown task (known: {sorted(TASKS)})"}),
                  flush=True)
            continue
        inst, prop, cfg, gen_kwargs, max_epochs = TASKS[task]
        task_dir = Path(args.project_root) / inst
        if not (task_dir / "subgraphs.pth").exists():
            prepare(task_dir, prop, seed=42, emb_epochs=100, **gen_kwargs)
        for dtype in ("float32", "bfloat16"):
            tag = "fp32" if dtype == "float32" else "bf16"
            out = (f"{args.project_root}/results/{inst}_parity_{tag}_"
                   f"{args.n_seeds}seeds")
            r = run_seeds(inst, args.project_root, str(cfg),
                          n_seeds=args.n_seeds, out_dir=out,
                          max_epochs=max_epochs,
                          overrides={"dtype": dtype})
            print(json.dumps({"task": inst, "dtype": dtype,
                              "micro_f1_mean": r["micro_f1_mean"],
                              "micro_f1_sd": r["micro_f1_sd"],
                              "auroc_mean": r["auroc_mean"],
                              "auroc_sd": r["auroc_sd"]}), flush=True)


if __name__ == "__main__":
    main()
