"""Tests for the C++ host kernels (skipped if the toolchain is absent)."""
import numpy as np
import networkx as nx
import pytest

from subgnn_tpu.data.graph import CSRGraph
from subgnn_tpu.ops import native


pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native library not built")


def to_csr(g):
    edges = np.asarray(list(g.edges()), dtype=np.int64) + 1
    return CSRGraph.from_edges(edges, n_nodes=max(g.nodes()) + 1)


def test_native_bfs_matches_numpy(small_graph):
    from subgnn_tpu.precompute.shortest_paths import _bfs_from_sources_host
    csr = to_csr(small_graph)
    got = native.bfs_all_pairs(csr)
    expect = _bfs_from_sources_host(csr, np.arange(1, csr.n_nodes + 1))
    np.testing.assert_array_equal(got, expect)


def test_native_bfs_disconnected():
    g = CSRGraph.from_edges(np.array([[1, 2], [2, 3], [4, 5]]), n_nodes=5)
    sp = native.bfs_all_pairs(g)
    assert sp[0, 1] == 1 and sp[0, 2] == 2
    assert sp[0, 3] == 0 and sp[3, 4] == 1


def test_native_walks_valid_and_deterministic(small_graph):
    csr = to_csr(small_graph)
    walks = native.triangular_walks_full(csr, n_walks=50, walk_len=12,
                                         rw_beta=0.7, seed=9)
    assert walks.shape == (50, 12)
    for w in walks:
        real = w[w != 0]
        assert len(real) >= 1
        for a, b in zip(real, real[1:]):
            assert small_graph.has_edge(int(a) - 1, int(b) - 1)
    walks2 = native.triangular_walks_full(csr, n_walks=50, walk_len=12,
                                          rw_beta=0.7, seed=9)
    np.testing.assert_array_equal(walks, walks2)


def test_native_bfs_speed(small_graph):
    """Native BFS on a 2k-node graph should be fast (sanity, not a perf
    gate)."""
    import time
    g = nx.barabasi_albert_graph(2000, 5, seed=1)
    csr = to_csr(g)
    t0 = time.time()
    sp = native.bfs_all_pairs(csr)
    dt = time.time() - t0
    assert sp.shape == (2000, 2000)
    assert dt < 10.0, dt
