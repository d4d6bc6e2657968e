"""Generate the checked-in miniature real-format dataset fixture.

Produces tests/fixtures/mini_multilabel/ in the reference's EXACT on-disk
contract (reference: SubGNN/train_config.py:216-231):

  edge_list.txt               whitespace edge list, 0-based raw ids
  subgraphs.pth               TSV "n1-n2-...\tLABEL\tsplit" — multilabel rows
                              use '-'-joined labels (subgraph_utils.py:60-66);
                              the val split is written SMALLER than test so
                              the reader's val/test swap quirk
                              (subgraph_utils.py:89-90) fires
  shortest_path_matrix.npy    dense (n, n) with the unreached=0 artifact
  degree_sequence.txt         JSON {raw_id: degree}
  ego_graphs.txt              JSON {raw_id: [1-hop raw ids]}
  gin_embeddings.pth          torch-saved FloatTensor (n, d)
  mini_config.json            run config pointing at the task

Deterministic; re-run only to regenerate the fixture after a format change.
Usage: PYTHONPATH=/root/repo python scripts/make_mini_fixture.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

from subgnn_tpu.data.graph import CSRGraph                         # noqa: E402
from subgnn_tpu.precompute.shortest_paths import (                 # noqa: E402
    shortest_path_matrix, ego_graphs_1hop, degree_dict)

OUT = REPO / "tests" / "fixtures" / "mini_multilabel"
N = 40


def main():
    rng = np.random.default_rng(7)
    task = OUT / "mini"
    task.mkdir(parents=True, exist_ok=True)

    # --- graph: ring + random chords so every node has degree >= 2 --------
    edges = {(i, (i + 1) % N) for i in range(N)}
    while len(edges) < 90:
        a, b = rng.integers(0, N, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    (task / "edge_list.txt").write_text(
        "\n".join(f"{a} {b}" for a, b in edges) + "\n")

    # --- subgraphs TSV: multilabel, val written smaller than test ---------
    rows = []
    labels_pool = [["A"], ["B"], ["A", "B"], ["B", "C"], ["C"]]
    split_plan = ["train"] * 8 + ["val"] * 2 + ["test"] * 4
    for i, split in enumerate(split_plan):
        nodes = rng.choice(N, size=6, replace=False)
        labs = labels_pool[i % len(labels_pool)]
        rows.append("-".join(map(str, nodes)) + "\t" + "-".join(labs)
                    + "\t" + split + "\t")
    (task / "subgraphs.pth").write_text("\n".join(rows) + "\n")

    # --- graph metrics in the reference formats ---------------------------
    g = CSRGraph.from_edgelist(task / "edge_list.txt")
    np.save(task / "shortest_path_matrix.npy", shortest_path_matrix(g))
    (task / "ego_graphs.txt").write_text(json.dumps(ego_graphs_1hop(g)))
    (task / "degree_sequence.txt").write_text(json.dumps(degree_dict(g)))

    # --- torch-saved embeddings (the reference's .pth contract) -----------
    import torch
    emb = rng.standard_normal((N, 8)).astype(np.float32)
    torch.save(torch.tensor(emb), task / "gin_embeddings.pth")

    # --- run config -------------------------------------------------------
    config = {
        "data": {"task": "mini"},
        "tb": {"tb_logging": False, "dir": "tb", "name": "mini"},
        "optuna": {"opt_n_trials": 1, "opt_n_cores": 1,
                   "monitor_metric": "val_micro_f1",
                   "opt_direction": "maximize", "sampler": "random",
                   "pruning": False},
        "hyperparams_fix": {
            "max_epochs": 3, "use_neighborhood": True, "use_structure": True,
            "use_position": True, "seed": 0,
            "structure_patch_type": "triangular_random_walk",
            "lstm_aggregator": "last", "resample_anchor_patches": False,
            "freeze_node_embeds": False, "use_mpn_projection": True,
            "compute_similarities": True, "sample_walk_len": 10,
            "n_triangular_walks": 3, "random_walk_len": 6, "rw_beta": 0.65,
            "ff_attn": False, "max_sim_epochs": 2, "embedding_type": "gin",
            "batch_size": 8, "learning_rate": 0.005, "grad_clip": 0.5,
            "n_layers": 1, "n_anchor_patches_pos_out": 4,
            "n_anchor_patches_pos_in": 2, "n_anchor_patches_N_in": 2,
            "n_anchor_patches_N_out": 2, "n_anchor_patches_structure": 4,
            "lstm_dropout": 0.0, "lstm_n_layers": 1, "lin_dropout": 0.0,
            "cc_aggregator": "sum", "trainable_cc": True,
            "batch_norm": False, "neigh_sample_border_size": 1},
        "hyperparams_optuna": {},
    }
    (OUT / "mini_config.json").write_text(json.dumps(config, indent=2))
    print(f"wrote fixture under {OUT}")


if __name__ == "__main__":
    main()
