"""Instance-ceiling oracle (scripts/instance_oracle.py, density_instance_scan.py).

The oracle bounds what ANY classifier can score on a synthetic instance
whose labels were assigned before later graph edits shifted the property
(reference labeling: prepare_dataset/prepare_dataset.py:641-753). These
tests pin the two scripts' shared math on hand-built instances.
"""
import sys
from pathlib import Path

import networkx as nx
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.density_instance_scan import oracle_ceiling  # noqa: E402
from scripts.instance_oracle import true_property  # noqa: E402
from subgnn_tpu.prepare.synthetic import write_subgraph_tsv  # noqa: E402


def _write_instance(tmp_path, G, subgraphs, labels, mask):
    nx.write_edgelist(G, str(tmp_path / "edge_list.txt"), data=False)
    write_subgraph_tsv(tmp_path / "subgraphs.pth", subgraphs, labels, mask)


def test_oracle_is_one_on_separable_instance(tmp_path):
    # class 0: triangles (density 1.0); class 1: 3-paths (density 2/3).
    # Labels match the property exactly -> nearest-class-mean is perfect.
    G = nx.Graph()
    subgraphs, labels = [], []
    node = 1  # 1-based ids, 0 = PAD everywhere
    for i in range(12):
        tri = [node, node + 1, node + 2]
        node += 3
        if i % 2 == 0:
            G.add_edges_from([(tri[0], tri[1]), (tri[1], tri[2]),
                              (tri[0], tri[2])])
            labels.append(0)
        else:
            G.add_edges_from([(tri[0], tri[1]), (tri[1], tri[2])])
            labels.append(1)
        subgraphs.append(tri)
    mask = [0] * 6 + [1] * 3 + [2] * 3  # train/val/test
    _write_instance(tmp_path, G, subgraphs, labels, mask)

    out = oracle_ceiling(tmp_path, "density")
    assert out["oracle_train_acc"] == 1.0
    assert out["oracle_val_acc"] == 1.0
    assert out["oracle_test_acc"] == 1.0


def test_oracle_detects_label_property_drift(tmp_path):
    # Same construction, but one test-split triangle is LABELED as class 0
    # (dense) while its edges make it a path — the post-labeling-edit case
    # the ceiling exists to quantify. Oracle must drop below 1.0 on test
    # and stay 1.0 on train.
    G = nx.Graph()
    subgraphs, labels, mask = [], [], []
    node = 1
    for i in range(8):
        tri = [node, node + 1, node + 2]
        node += 3
        dense = i % 2 == 0
        edges = [(tri[0], tri[1]), (tri[1], tri[2])]
        if dense:
            edges.append((tri[0], tri[2]))
        G.add_edges_from(edges)
        subgraphs.append(tri)
        labels.append(0 if dense else 1)
        # val must be >= test or read_subgraphs' swap quirk flips them
        mask.append(0 if i < 5 else 1)
    # drifted subgraph: labeled dense, built sparse
    tri = [node, node + 1, node + 2]
    G.add_edges_from([(tri[0], tri[1]), (tri[1], tri[2])])
    subgraphs.append(tri)
    labels.append(0)
    mask.append(2)
    _write_instance(tmp_path, G, subgraphs, labels, mask)

    out = oracle_ceiling(tmp_path, "density")
    assert out["oracle_train_acc"] == 1.0
    assert out["oracle_test_acc"] < 1.0


def test_true_property_definitions():
    # pinned against the generator's definitions (prepare/synthetic.py:220-233)
    G = nx.Graph([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    assert true_property(G, [1, 2, 3], "density") == 1.0
    assert np.isclose(true_property(G, [3, 4, 5], "density"), 2 / 3)
    # cut_ratio: boundary edges / (|S| * (n - |S|)); boundary of {1,2,3} = {3-4}
    assert np.isclose(true_property(G, [1, 2, 3], "cut_ratio"), 1 / (3 * 2))
    assert true_property(G, [1, 2, 3], "cc") == 1.0
    assert true_property(G, [1, 2, 4, 5], "cc") == 2.0
    # coreness: mean core number inside the induced subgraph
    assert true_property(G, [1, 2, 3], "coreness") == 2.0
