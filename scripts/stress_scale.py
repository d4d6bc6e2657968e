"""EM-USER-scale stress test: full pipeline on an n-node base graph.

EM-USER is the reference's largest dataset (~57k nodes, 324 subgraphs,
reference: SubGNN/train_config.py:227-231 path wiring; dataset card in the
paper). The reference materializes a (n_sub, max_cc, n_nodes) float32
similarity tensor per N/P sub-channel (SubGNN.py:763) — at 57k nodes that
is the memory wall our compact anchor-column sims remove (train/sims.py).
This script generates an n-node instance, runs the full pipeline
(precompute incl. all-pairs BFS + GraphSAINT node-emb pretraining +
fused-epoch training) and reports per-stage wall times.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/stress_scale.py \
        [-n 57000] [-n_subgraphs 320] [-epochs 10] [-task scale57k]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=57000)
    ap.add_argument("-n_subgraphs", type=int, default=320)
    ap.add_argument("-epochs", type=int, default=10)
    ap.add_argument("-task", default="scale57k")
    ap.add_argument("-project_root", default="data")
    ap.add_argument("-emb_epochs", type=int, default=40)
    ap.add_argument("-emb_dim", type=int, default=64)
    ap.add_argument("-ref_hparams", default=None,
                    help="path to a reference hyperparams.json (e.g. the "
                         "frozen EM-USER or PPI-BP winner) — runs the "
                         "pipeline with that EXACT configuration instead "
                         "of the built-in N+P smoke config")
    ap.add_argument("-max_epochs", type=int, default=None,
                    help="override max_epochs of -ref_hparams")
    args = ap.parse_args()

    from subgnn_tpu.cli.prepare_dataset import prepare
    from subgnn_tpu.config import HParams, RunConfig
    from subgnn_tpu.train.runner import SubGNNPipeline, load_best_hyperparams

    root = Path(args.project_root)
    task_dir = root / args.task
    stages = {}

    t0 = time.time()
    have_graph = (task_dir / "subgraphs.pth").exists()
    have_emb = (task_dir / "gin_embeddings.npy").exists()
    if not (have_graph and have_emb):
        # GraphSAINT minibatching: full-batch link-pred does not fit/scale
        # at 57k nodes (round-1 limitation, closed in round 2)
        prepare(task_dir, "density", seed=42, conv="gin",
                emb_dim=args.emb_dim,
                emb_epochs=args.emb_epochs, emb_minibatch="graphsaint",
                generate_graph=not have_graph,
                n=args.n, n_subgraphs=args.n_subgraphs,
                n_subgraph_nodes=20)
    stages["prepare_s"] = round(time.time() - t0, 1)

    if args.ref_hparams:
        hp = load_best_hyperparams(args.ref_hparams)
        if args.max_epochs is not None:
            hp = hp.replace(max_epochs=args.max_epochs)
    else:
        hp = HParams(use_neighborhood=True, use_structure=False,
                     use_position=True, n_layers=1, batch_size=64,
                     max_epochs=args.epochs, learning_rate=1e-3,
                     n_anchor_patches_N_in=10, n_anchor_patches_N_out=20,
                     n_anchor_patches_pos_in=20, n_anchor_patches_pos_out=40,
                     linear_hidden_dim_1=64, linear_hidden_dim_2=32, seed=0)
    rc = RunConfig(task=args.task, project_root=root)
    pipe = SubGNNPipeline(rc, hp,
                          results_dir=root / "results" / args.task)
    t0 = time.time()
    out = pipe.run(log_fn=None)
    stages["pipeline_s"] = round(time.time() - t0, 1)
    tr = pipe.trainer
    epoch_times = [m["epoch_time_s"] for m in tr.metric_scores]
    stages["steady_epoch_s"] = round(float(min(epoch_times[1:])), 3)
    stages["compact_sims"] = bool(tr.compact_sims)

    import jax
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "n_nodes": args.n, "n_subgraphs": args.n_subgraphs,
        **stages,
        "test_micro_f1": out["test"]["test_micro_f1"],
        "train_edges_per_s": tr.metric_scores[-1]["train_edges_per_s"],
    }))


if __name__ == "__main__":
    main()
