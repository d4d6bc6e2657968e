import numpy as np
import networkx as nx
import pytest

from subgnn_tpu.data.graph import CSRGraph


def to_csr(g: nx.Graph) -> CSRGraph:
    edges = np.asarray(list(g.edges()), dtype=np.int64) + 1
    return CSRGraph.from_edges(edges, n_nodes=max(g.nodes()) + 1)


def test_neighbors_match_networkx(small_graph):
    csr = to_csr(small_graph)
    for v in small_graph.nodes():
        expect = sorted(u + 1 for u in small_graph.neighbors(v))
        got = csr.neighbors(v + 1).tolist()
        assert got == expect


def test_degrees(small_graph):
    csr = to_csr(small_graph)
    deg = csr.degrees
    assert deg[0] == 0
    for v in small_graph.nodes():
        assert deg[v + 1] == small_graph.degree(v)


def test_has_edge(small_graph):
    csr = to_csr(small_graph)
    for u, v in list(small_graph.edges())[:50]:
        assert csr.has_edge(u + 1, v + 1)
        assert csr.has_edge(v + 1, u + 1)
    assert not csr.has_edge(1, 1) or small_graph.has_edge(0, 0)


def test_connected_components(small_graph, rng):
    csr = to_csr(small_graph)
    for _ in range(20):
        nodes = rng.choice(60, size=rng.integers(2, 15), replace=False) + 1
        got = csr.connected_components(nodes.tolist())
        sub = small_graph.subgraph([n - 1 for n in nodes])
        expect = [sorted(x + 1 for x in cc) for cc in nx.connected_components(sub)]
        got_sets = sorted(tuple(sorted(c)) for c in got)
        exp_sets = sorted(tuple(c) for c in expect)
        assert got_sets == exp_sets


def test_khop_neighborhood(small_graph, rng):
    csr = to_csr(small_graph)
    for k in (1, 2):
        for _ in range(10):
            seeds = (rng.choice(60, size=3, replace=False) + 1).tolist()
            got = csr.khop_neighborhood(seeds, k)
            expect = set()
            for s in seeds:
                expect |= {n + 1 for n in nx.ego_graph(small_graph, s - 1, radius=k).nodes()}
            assert got == expect


def test_border_nodes(small_graph, rng):
    csr = to_csr(small_graph)
    nodes = (rng.choice(60, size=8, replace=False) + 1).tolist()
    in_border, external = csr.border_nodes(nodes)
    sub = small_graph.subgraph([n - 1 for n in nodes])
    expect_border = sorted(
        n + 1 for n in sub.nodes()
        if any((u not in sub.nodes()) for u in small_graph.neighbors(n))
    )
    assert sorted(in_border.tolist()) == expect_border
    assert set(external.tolist()) == {n + 1 for n in small_graph.nodes()} - set(nodes)


def test_induced_degrees(small_graph, rng):
    csr = to_csr(small_graph)
    nodes = rng.choice(60, size=10, replace=False) + 1
    got = csr.induced_degrees(nodes)
    sub = small_graph.subgraph([n - 1 for n in nodes])
    expect = [sub.degree(n - 1) for n in nodes]
    assert got.tolist() == expect


def test_edgelist_roundtrip(tmp_path, small_graph):
    p = tmp_path / "edge_list.txt"
    with open(p, "w") as f:
        for u, v in small_graph.edges():
            f.write(f"{u} {v}\n")
    csr = CSRGraph.from_edgelist(p)
    assert csr.n_nodes == 60
    for v in small_graph.nodes():
        assert csr.neighbors(v + 1).tolist() == sorted(u + 1 for u in small_graph.neighbors(v))
