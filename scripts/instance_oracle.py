"""Instance-ceiling oracle for self-generated synthetic instances.

Labels on a synthetic instance are quantile bins of the target property
(reference: prepare_dataset/prepare_dataset.py:641-753), but later graph
edits while placing OTHER subgraphs can shift a subgraph's property after
its label was assigned — so even a classifier that knows the true property
cannot always reach 1.0. This script measures that ceiling: it recomputes
the true property of every subgraph from the shipped edge list, fits a
nearest-class-mean classifier on the train split's property values, and
reports val/test accuracy. A model cannot beat this number on the
instance; paper-vs-us comparisons below it are instance noise, not model
gaps.

    PYTHONPATH=/root/repo python scripts/instance_oracle.py \
        -task cutratio250 -property cut_ratio [-project_root data]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def true_property(G, nodes, prop):
    """Same definitions as the generator (prepare/synthetic.py:220-233,
    reference: prepare_dataset/prepare_dataset.py:519-550)."""
    import networkx as nx
    sub = G.subgraph(nodes)
    if prop == "density":
        return nx.density(sub)
    if prop == "cut_ratio":
        # len(G.nodes) as the denominator's node count assumes NO isolated
        # nodes (the generator keeps the largest connected component, so
        # every id 1..n appears in edge_list.txt) — assert it
        assert max(G.nodes) == len(G.nodes), \
            "non-contiguous node ids: cut_ratio denominator would shift"
        rest = set(G.nodes) - set(sub.nodes)
        boundary = len(list(nx.edge_boundary(G, sub.nodes, rest)))
        return boundary / (len(sub.nodes) * (len(G.nodes) - len(sub.nodes)))
    if prop == "coreness":
        return float(np.mean(list(nx.core_number(sub).values())))
    if prop == "cc":
        return float(nx.number_connected_components(sub))
    raise SystemExit(f"unknown property {prop}")


def oracle_ceiling(task_dir: str | Path, prop: str) -> dict:
    """Nearest-class-mean oracle accuracies for one instance dir.

    The single shared implementation — density_instance_scan.py imports
    this so scan ceilings can never diverge from the per-task oracle rows
    (both are pinned by tests/test_instance_oracle.py)."""
    import networkx as nx
    from subgnn_tpu.data.subgraphs import read_subgraphs

    task_dir = Path(task_dir)
    G = nx.read_edgelist(task_dir / "edge_list.txt", nodetype=int)
    tr_G, tr_L, va_G, va_L, te_G, te_L, multilabel = read_subgraphs(
        task_dir / "subgraphs.pth")
    assert not multilabel, "oracle supports single-label synthetics"

    def props(subs):
        return np.array([true_property(G, s, prop) for s in subs])

    p_tr, p_va, p_te = props(tr_G), props(va_G), props(te_G)
    classes = np.unique(tr_L)
    means = np.array([p_tr[tr_L == c].mean() for c in classes])

    def acc(p, y):
        pred = classes[np.abs(p[:, None] - means[None, :]).argmin(1)]
        return float((pred == y).mean())

    return {
        "class_property_means": {int(c): float(m)
                                 for c, m in zip(classes, means)},
        "oracle_train_acc": acc(p_tr, tr_L),
        "oracle_val_acc": acc(p_va, va_L),
        "oracle_test_acc": acc(p_te, te_L),
        "n": {"train": len(tr_G), "val": len(va_G), "test": len(te_G)},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-task", required=True)
    ap.add_argument("-property", required=True,
                    choices=["density", "cut_ratio", "coreness", "cc"])
    ap.add_argument("-project_root", default="data")
    args = ap.parse_args()

    out = dict(task=args.task, property=args.property,
               **oracle_ceiling(Path(args.project_root) / args.task,
                                args.property))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
