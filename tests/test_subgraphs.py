import numpy as np

from subgnn_tpu.data.subgraphs import read_subgraphs, reindex_subgraphs, MultiLabelBinarizer
from subgnn_tpu.data.dataset import initialize_cc_ids, pad_node_lists, SubgraphData
from subgnn_tpu.data.graph import CSRGraph


def write_tsv(path, rows):
    with open(path, "w") as f:
        for nodes, label, split in rows:
            f.write("-".join(map(str, nodes)) + "\t" + label + "\t" + split + "\n")


def test_read_single_label(tmp_path):
    p = tmp_path / "subgraphs.pth"
    write_tsv(p, [
        ([0, 1, 2], "A", "train"),
        ([3, 4], "B", "train"),
        ([5, 6], "A", "val"),
        ([7], "B", "val"),
        ([8, 9], "B", "test"),
    ])
    tr, trl, va, val, te, tel, ml = read_subgraphs(p)
    assert not ml
    assert tr == [[0, 1, 2], [3, 4]]
    assert trl.tolist() == [0, 1]
    assert va == [[5, 6], [7]] and te == [[8, 9]]
    assert val.tolist() == [0, 1] and tel.tolist() == [1]


def test_val_test_swap(tmp_path):
    # quirk: when val < test the splits are swapped (subgraph_utils.py:89-90)
    p = tmp_path / "subgraphs.pth"
    write_tsv(p, [
        ([0, 1], "A", "train"),
        ([2], "A", "val"),
        ([3], "B", "test"),
        ([4], "B", "test"),
    ])
    tr, trl, va, val, te, tel, ml = read_subgraphs(p)
    assert va == [[3], [4]]  # test became val
    assert te == [[2]]


def test_multilabel(tmp_path):
    p = tmp_path / "subgraphs.pth"
    write_tsv(p, [
        ([0, 1], "X-Y", "train"),
        ([2, 3], "Y", "val"),
        ([4], "Z", "val"),
        ([5], "X", "test"),
    ])
    tr, trl, va, val, te, tel, ml = read_subgraphs(p)
    assert ml
    assert trl == [[0, 1]]
    mb = MultiLabelBinarizer().fit(trl + val + tel)
    mat = mb.transform(trl)
    assert mat.shape == (1, 3)
    assert mat.sum() == 2


def test_reindex():
    assert reindex_subgraphs([[0, 2], [5]]) == [[1, 3], [6]]


def test_initialize_cc_ids():
    # path graph 1-2-3, isolated pair 5-6 (1-based)
    edges = np.array([[1, 2], [2, 3], [5, 6]])
    g = CSRGraph.from_edges(edges, n_nodes=6)
    cc = initialize_cc_ids(g, [[1, 2, 3], [1, 5, 6], [3]])
    assert cc.shape == (3, 2, 3)
    # subgraph 0: one cc of 3 nodes
    assert sorted(cc[0, 0].tolist()) == [1, 2, 3]
    assert cc[0, 1].tolist() == [0, 0, 0]
    # subgraph 1: two ccs
    sets = {tuple(sorted(x for x in row if x)) for row in cc[1]}
    assert sets == {(1,), (5, 6)}
    # subgraph 2: single node cc
    assert cc[2, 0].tolist() == [3, 0, 0]


def test_batches_static_shapes():
    edges = np.array([[1, 2], [2, 3], [3, 4], [4, 5]])
    g = CSRGraph.from_edges(edges, n_nodes=5)
    subgraphs = [[1, 2], [2, 3], [3, 4], [4, 5], [1, 5]]
    labels = np.array([0, 1, 0, 1, 0])
    data = SubgraphData.build(g, subgraphs, labels, multilabel=False)
    data.NP_sim = np.random.rand(5, data.cc_ids.shape[1], 5).astype(np.float32)
    # train: drop_last
    batches = list(data.batches(2, shuffle=True, drop_last=True,
                                rng=np.random.default_rng(0)))
    assert len(batches) == 2
    for b in batches:
        assert b["cc_ids"].shape == (2, data.cc_ids.shape[1], data.cc_ids.shape[2])
        assert b["NP_sim"].shape == (2, data.cc_ids.shape[1], 5)
    # eval: padded final batch with valid mask
    batches = list(data.batches(2, shuffle=False, drop_last=False))
    assert len(batches) == 3
    assert batches[-1]["valid"].tolist() == [True, False]


def test_read_subgraphs_fuzz_robustness(tmp_path):
    """Randomized TSV robustness: CRLF endings, blank/whitespace lines,
    empty node segments ('1--2'), extra columns, unknown split tokens, and
    a missing trailing newline must all parse without crashing, with split
    counts/labels matching an independent line-level count (the two most
    recent parser bugs — 4-column rows and blank lines — were exactly this
    class; reference semantics at SubGNN/subgraph_utils.py:24-92)."""
    import numpy as np
    from subgnn_tpu.data.subgraphs import read_subgraphs

    rng = np.random.default_rng(7)
    splits = ["train", "val", "test", "bogus"]
    for trial in range(20):
        lines, expected = [], {"train": 0, "val": 0, "test": 0}
        n_lines = int(rng.integers(3, 25))
        multilabel = bool(rng.integers(0, 2))
        for _ in range(n_lines):
            kind = rng.random()
            if kind < 0.1:
                lines.append("   " if rng.random() < 0.5 else "")
                continue
            nodes = rng.integers(0, 50, size=int(rng.integers(1, 6)))
            node_s = "-".join(str(n) for n in nodes)
            if rng.random() < 0.2:      # empty segment: '1--2'
                node_s = node_s.replace("-", "--", 1)
            n_lab = int(rng.integers(2, 4)) if multilabel else 1
            lab_s = "-".join(f"L{int(l)}" for l in
                             rng.integers(0, 5, size=n_lab))
            split = splits[int(rng.integers(0, len(splits)))]
            cols = [node_s, lab_s, split]
            if rng.random() < 0.25:     # trailing 4th column
                cols.append("extra")
            if split in expected:
                expected[split] += 1
            eol = "\r\n" if rng.random() < 0.3 else "\n"
            lines.append("\t".join(cols) + eol.rstrip("\n"))
        body = "\n".join(lines)
        if rng.random() < 0.5:
            body += "\n"
        f = tmp_path / f"fuzz{trial}.tsv"
        f.write_text(body)

        tr, trL, va, vaL, te, teL, ml = read_subgraphs(f)
        # swap quirk: returned val is never the smaller of (val, test)
        assert len(va) >= len(te)
        assert {len(tr), len(va), len(te)} == {
            expected["train"],
            max(expected["val"], expected["test"]),
            min(expected["val"], expected["test"])} or (
            len(tr) == expected["train"]
            and sorted([len(va), len(te)])
            == sorted([expected["val"], expected["test"]]))
        for g in (tr, va, te):
            for nodes in g:
                assert nodes and all(isinstance(n, int) for n in nodes)
        if not ml:
            for L in (trL, vaL, teL):
                assert L.dtype == np.int64


def test_read_subgraphs_short_line_clear_error(tmp_path):
    """A non-blank row with <3 tab-separated columns raises a ValueError
    naming file:line, not a raw IndexError."""
    import pytest
    from subgnn_tpu.data.subgraphs import read_subgraphs

    f = tmp_path / "short.tsv"
    f.write_text("1-2\tA\ttrain\n3-4-5\n")
    with pytest.raises(ValueError, match=r"short\.tsv:2.*3 tab-separated"):
        read_subgraphs(f)


def test_initialize_cc_ids_empty_rejected():
    import pytest
    from subgnn_tpu.data.dataset import initialize_cc_ids
    from subgnn_tpu.data.graph import CSRGraph

    g = CSRGraph.from_edges(np.array([[1, 2]]), n_nodes=2)
    with pytest.raises(ValueError, match="no subgraphs"):
        initialize_cc_ids(g, [])
