"""Reproduce the four synthetic benchmarks end-to-end.

Generates each dataset (base graph + subgraphs + node embeddings + graph
metrics), then trains with the corresponding frozen reference
hyperparameters (best_model_hyperparameters/<task>/) or our defaults, and
reports test metrics. Results land in data/results/<task>/.

Usage:
    python scripts/reproduce_synthetics.py [--tasks density,cut_ratio,...]
        [--seeds 3] [--epochs-cap N] [--hyperparams {S,N,P,all}]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from subgnn_tpu.config import HParams, RunConfig  # noqa: E402
from subgnn_tpu.cli.prepare_dataset import prepare  # noqa: E402
from subgnn_tpu.train.runner import SubGNNPipeline  # noqa: E402

# reference task-name mapping: our generator property -> dataset dir name
TASKS = {
    "density": dict(prop="density", ref_dir="density"),
    "cut_ratio": dict(prop="cut_ratio", ref_dir="cutratio"),
    "coreness": dict(prop="coreness", ref_dir="coreness"),
    "cc": dict(prop="cc", ref_dir="component"),
}

import os
REF_HP_ROOT = Path(os.environ.get("SUBGNN_REF_HPARAMS",
                                  "/root/reference/best_model_hyperparameters"))


def hyperparams_for(task: str, channel_set: str) -> dict:
    ref_dir = TASKS[task]["ref_dir"]
    name = {"S": "S", "N": "N", "P": "P", "all": "all"}[channel_set]
    cand = REF_HP_ROOT / ref_dir / f"{name}_{ref_dir}_hyperparams.json"
    if cand.exists():
        return json.loads(cand.read_text())
    # fallback: structure-heavy defaults
    return dict(use_neighborhood=channel_set in ("N", "all"),
                use_structure=channel_set in ("S", "all"),
                use_position=channel_set in ("P", "all"),
                n_layers=2, max_epochs=150, batch_size=64,
                learning_rate=3e-4, grad_clip=0.2,
                n_anchor_patches_structure=20, sample_walk_len=50,
                n_triangular_walks=5, random_walk_len=10,
                linear_hidden_dim_1=64, linear_hidden_dim_2=64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", default="density,cut_ratio,coreness,cc")
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--epochs-cap", type=int, default=None)
    ap.add_argument("--hyperparams", default="S",
                    choices=["S", "N", "P", "all"])
    ap.add_argument("--data-root", default=str(REPO / "data"))
    ap.add_argument("--skip-prepare", action="store_true")
    args = ap.parse_args()

    root = Path(args.data_root)
    summary = {}
    for task in args.tasks.split(","):
        cfg = TASKS[task]
        task_dir = root / cfg["ref_dir"]
        if not args.skip_prepare and not (task_dir / "subgraphs.pth").exists():
            print(f"== preparing {task} ==", flush=True)
            prepare(task_dir, cfg["prop"], seed=42, conv="gin", emb_dim=64,
                    emb_epochs=100, n=1000, n_subgraphs=250,
                    n_subgraph_nodes=20)
        hyp = hyperparams_for(task, args.hyperparams)
        if args.epochs_cap:
            hyp["max_epochs"] = min(hyp.get("max_epochs", 150), args.epochs_cap)
        rc = RunConfig(task=cfg["ref_dir"], project_root=root)
        f1s, accs, aucs = [], [], []
        for seed in range(args.seeds):
            hp = HParams.from_dict(dict(hyp, seed=seed))
            pipe = SubGNNPipeline(
                rc, hp, results_dir=root / "results" /
                f"{cfg['ref_dir']}_{args.hyperparams}_seed{seed}")
            t0 = time.time()
            out = pipe.run(seed=seed, log_fn=None)
            t = out["test"]
            f1s.append(t["test_micro_f1"])
            accs.append(t["test_acc"])
            aucs.append(t["test_auroc"])
            print(f"{task} seed {seed}: micro_f1={t['test_micro_f1']:.3f} "
                  f"acc={t['test_acc']:.3f} auroc={t['test_auroc']:.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        summary[task] = {
            "micro_f1_mean": float(np.mean(f1s)),
            "micro_f1_sd": float(np.std(f1s)),
            "acc_mean": float(np.mean(accs)),
            "auroc_mean": float(np.mean(aucs)),
            "n_seeds": args.seeds,
            "channels": args.hyperparams,
        }
        print(task, "->", json.dumps(summary[task]), flush=True)
    out_path = root / "results" / "synthetics_summary.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
