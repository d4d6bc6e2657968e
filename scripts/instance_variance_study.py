"""Instance-to-instance variance controls (RESULTS.md "Instance-to-
instance variance control" tables).

For each task, regenerate the synthetic instance from several generator
seeds and re-run the SAME frozen configuration for 10 seeds each — the
swing across instance draws with identical code+config measures how much
of any single-instance score is the draw, not the framework. Also runs
the nearest-class-mean oracle per instance (scripts/instance_oracle.py)
to measure each draw's ceiling.

Usage (CPU-friendly; this produced the RESULTS.md rows during a
TPU-tunnel outage):
  PYTHONPATH=/root/repo python scripts/instance_variance_study.py \
      [-seeds 43,44,45] [-tasks cutratio,density,component,coreness5k]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REF = "/root/reference/best_model_hyperparameters"
# task -> (property, frozen config, generator kwargs, result tag[, max_epochs])
TASKS = {
    "cutratio": ("cut_ratio", f"{REF}/cutratio/S_cutratio_hyperparams.json",
                 dict(n=1000, n_subgraphs=250, n_subgraph_nodes=20), "Sref"),
    "density": ("density", f"{REF}/density/S_density_hyperparams.json",
                dict(n=1000, n_subgraphs=250, n_subgraph_nodes=20), "Sref"),
    "component": ("cc", f"{REF}/component/all_component_hyperparams.json",
                  dict(n=1000, n_subgraphs=250, n_subgraph_nodes=20),
                  "ALLref"),
    # per-channel winner: component count is a position property, so the
    # reference's frozen P config is the one that beats paper (RESULTS.md
    # 0.988 +/- 0.018 on v1 at 500 epochs) — variance-control it too
    "component_P": ("cc", f"{REF}/component/P_component_hyperparams.json",
                    dict(n=1000, n_subgraphs=250, n_subgraph_nodes=20),
                    "Pref_500ep", 500),
    # coreness needs the 5k-node base graph (RESULTS.md: the 1k-node "250"
    # instance only fits ~50 planted subgraphs); config = our HPO winner,
    # read from the version-controlled copy (run_synthetic_protocol.py
    # writes configs/best/ since the 2026-08-18 data/ wipe)
    "coreness5k": ("coreness", "configs/best/coreness5k_hyperparams.json",
                   dict(n=5000, n_subgraphs=250, n_subgraph_nodes=20),
                   "hpo"),
}
# tag instances v2, v3, ... for generator seeds 43, 44, ... (v1 = seed 42,
# the original protocol instance)
def tag_for_seed(seed: int) -> str:
    return f"v{seed - 41}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-seeds", default="43,44,45",
                    help="comma-separated generator seeds (42 = v1)")
    ap.add_argument("-tasks", default="cutratio,density,component,coreness5k")
    ap.add_argument("-n_seeds", type=int, default=10)
    ap.add_argument("-project_root", default="data")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from subgnn_tpu.cli.prepare_dataset import prepare
    from subgnn_tpu.cli.test import run_seeds

    # fail fast on missing frozen configs BEFORE any expensive prepare()
    # (the coreness5k winner only exists after queue27 / a protocol run)
    tasks = [t.strip() for t in args.tasks.split(",")]
    for task in tasks:
        cfg_path = Path(TASKS[task][1])
        if not cfg_path.is_absolute():
            cfg_path = REPO / cfg_path
        if not cfg_path.exists():
            raise FileNotFoundError(
                f"frozen config for task {task!r} missing: {cfg_path} "
                "(for coreness5k, run scripts/run_synthetic_protocol.py "
                "first — it writes configs/best/)")

    for task in tasks:
        prop, cfg, gen_kwargs, reftag, *rest = TASKS[task]
        if not Path(cfg).is_absolute():
            cfg = str(REPO / cfg)  # robust to callers not cd'd to the repo
        max_epochs = rest[0] if rest else None
        base = ("coreness5k" if task == "coreness5k"
                else f"{task.split('_')[0]}250")
        for seed in (int(s) for s in args.seeds.split(",")):
            tag = tag_for_seed(seed)
            inst = (f"{base}_{tag}" if task == "coreness5k"
                    else f"{base}{tag}")
            prepare(f"{args.project_root}/{inst}", prop, seed=seed,
                    emb_epochs=100, **gen_kwargs)
            out = (f"{args.project_root}/results/{inst}_{reftag}_"
                   f"{args.n_seeds}seeds"
                   if task != "coreness5k" else
                   f"{args.project_root}/results/{inst}_{args.n_seeds}seeds")
            r = run_seeds(inst, args.project_root, cfg,
                          n_seeds=args.n_seeds, out_dir=out,
                          max_epochs=max_epochs)
            print(json.dumps({"instance": inst,
                              "micro_f1_mean": r["micro_f1_mean"],
                              "micro_f1_sd": r["micro_f1_sd"]}))
            subprocess.run([sys.executable, "scripts/instance_oracle.py",
                            "-task", inst, "-property", prop,
                            "-project_root", args.project_root],
                           cwd=REPO, check=False)


if __name__ == "__main__":
    main()
