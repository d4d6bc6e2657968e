"""DENSITY sensitivity to the node-embedding pretraining draw (round 3).

Round-3 accident turned measurement: regenerating density250 (same graph
seed 42 — oracle ceiling 0.92 unchanged) with emb_epochs=100 instead of
the round-2 protocol's 80 moved the frozen-S 200-epoch 10-seed retest
from 0.852 +/- 0.062 to 0.784 +/- 0.041. The GIN link-pred pretraining
(prepare/node_emb.py) is part of the instance draw: this script
quantifies how much of the density gap to paper is the EMBEDDING draw by
holding the graph + precompute artifacts fixed and retraining only the
embeddings across (emb_epochs, emb_seed) variants, each retested with
the reference's frozen S config x 10 training seeds.

(80, 42) reproduces the round-2 protocol embeddings exactly
(deterministic), so its retest doubles as a regression check on the
0.852 headline row.

Usage:
  PYTHONPATH=/root/repo python scripts/density_emb_sensitivity.py
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

S_CFG = "/root/reference/best_model_hyperparameters/density/S_density_hyperparams.json"
GRAPH_FILES = ("edge_list.txt", "subgraphs.pth", "shortest_path_matrix.npy",
               "degree_sequence.txt", "ego_graphs.txt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-variants", default="80:42,80:43,80:44,100:43,100:44,150:42",
                    help="comma list of emb_epochs:emb_seed")
    ap.add_argument("-n_seeds", type=int, default=10)
    ap.add_argument("-project_root", default="data")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from subgnn_tpu.cli.test import run_seeds
    from subgnn_tpu.data.graph import CSRGraph
    from subgnn_tpu.prepare.node_emb import (save_embeddings,
                                             train_node_embeddings)

    root = Path(args.project_root)
    base = root / "density250"
    assert (base / "subgraphs.pth").exists(), "generate density250 first"

    for spec in args.variants.split(","):
        ep, es = (int(x) for x in spec.split(":"))
        task = f"density250_emb{ep}s{es}"
        vdir = root / task
        if not (vdir / "gin_embeddings.npy").exists():
            vdir.mkdir(parents=True, exist_ok=True)
            for f in GRAPH_FILES:
                # shortest_path_matrix.npy is absent above
                # _FULL_SP_MAX_NODES (rows path) — copy what exists
                if (base / f).exists():
                    shutil.copy(base / f, vdir / f)
            # graph-only artifacts: similarities do not depend on the
            # embeddings (NP = hop distances, S = degree-seq DTW)
            if (base / "similarities").exists() and \
                    not (vdir / "similarities").exists():
                shutil.copytree(base / "similarities", vdir / "similarities")
            graph = CSRGraph.from_edgelist(vdir / "edge_list.txt")
            emb, metrics = train_node_embeddings(
                graph, conv_type="gin", out_dim=64, epochs=ep, seed=es)
            save_embeddings(vdir, emb, "gin")
            print(json.dumps({"variant": task, "emb_val_auc":
                              metrics["val_auc"], "emb_test_auc":
                              metrics["test_auc"]}), flush=True)
        r = run_seeds(task, str(root), S_CFG, n_seeds=args.n_seeds,
                      out_dir=str(root / "results" /
                                  f"{task}_Sref_{args.n_seeds}seeds"))
        print(json.dumps({"variant": task, "emb_epochs": ep, "emb_seed": es,
                          "micro_f1_mean": r["micro_f1_mean"],
                          "micro_f1_sd": r["micro_f1_sd"],
                          "auroc_mean": r["auroc_mean"]}), flush=True)


if __name__ == "__main__":
    main()
