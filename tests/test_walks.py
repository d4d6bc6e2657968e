import numpy as np
import networkx as nx

from subgnn_tpu.data.graph import CSRGraph
from subgnn_tpu.config import HParams
from subgnn_tpu.sampling.walks import (
    triangular_random_walk, sample_structure_anchor_patches,
    perform_random_walks)
from subgnn_tpu.sampling.anchors import (
    _sample_from_rows, init_anchors_neighborhood, init_anchors_pos_int,
    init_anchors_pos_ext, init_anchors_structure)


def to_csr(g):
    edges = np.asarray(list(g.edges()), dtype=np.int64) + 1
    return CSRGraph.from_edges(edges, n_nodes=max(g.nodes()) + 1)


def check_walk_valid(g_nx, walk):
    for a, b in zip(walk, walk[1:]):
        assert g_nx.has_edge(a - 1, b - 1), (a, b)


def test_walk_edges_valid(small_graph):
    csr = to_csr(small_graph)
    all_nodes = csr.node_ids()
    for i in range(20):
        rng = np.random.default_rng(i)
        walk = triangular_random_walk(csr, rng, walk_len=12, rw_beta=0.7,
                                      start_nodes=all_nodes)
        assert 1 <= len(walk) <= 12
        check_walk_valid(small_graph, walk)


def test_walk_restricted_to_member(small_graph, rng):
    csr = to_csr(small_graph)
    patch = rng.choice(60, size=10, replace=False) + 1
    member = np.zeros(61, dtype=bool)
    member[patch] = True
    for i in range(10):
        w = triangular_random_walk(csr, np.random.default_rng(i), 8, 0.7,
                                   start_nodes=patch, member=member)
        assert set(w) <= set(patch.tolist())


def test_triangle_bias():
    # graph: triangle 1-2-3 plus pendant 4 attached to 2.
    # from prev=1, curr=2: neighbor 3 closes a triangle, 4 does not.
    g = CSRGraph.from_edges(np.array([[1, 2], [2, 3], [1, 3], [2, 4]]), 4)
    tri_hits = 0
    n = 2000
    for i in range(n):
        rng = np.random.default_rng(i)
        # force start at 1 then walk; count how often 3 follows [1, 2]
        w = triangular_random_walk(g, rng, 3, 0.9, start_nodes=np.array([1]))
        if len(w) == 3 and w[0] == 1 and w[1] == 2:
            if w[2] == 3:
                tri_hits += 1
            frac = None
    walks_12 = sum(1 for i in range(n)
                   if (lambda w: len(w) == 3 and w[:2] == [1, 2])(
                       triangular_random_walk(g, np.random.default_rng(i), 3, 0.9,
                                              start_nodes=np.array([1]))))
    assert walks_12 > 100
    # with beta=0.9, ~90% of steps from (1,2) should close the triangle
    assert tri_hits / walks_12 > 0.8


def test_structure_patch_sampling(small_graph):
    csr = to_csr(small_graph)
    hp = HParams(n_layers=2, n_anchor_patches_structure=4, max_sim_epochs=2,
                 sample_walk_len=10, rw_beta=0.5)
    patches = sample_structure_anchor_patches(csr, hp, seed=0, max_sim_epochs=2)
    assert patches.shape[0] == 2 * 4 * 2
    for p in patches:
        real = p[p != 0]
        assert len(real) >= 1
        check_walk_valid(small_graph, real.tolist())
    # determinism
    patches2 = sample_structure_anchor_patches(csr, hp, seed=0, max_sim_epochs=2)
    assert np.array_equal(patches, patches2)


def test_perform_random_walks(small_graph):
    csr = to_csr(small_graph)
    hp = HParams(n_triangular_walks=3, random_walk_len=6, rw_beta=0.5)
    patches = np.zeros((3, 8), dtype=np.int32)
    rng = np.random.default_rng(1)
    for i in range(2):
        patches[i, :6] = rng.choice(60, size=6, replace=False) + 1
    # row 2 is all padding
    walks_int = perform_random_walks(csr, hp, patches, inside=True, seed=0)
    walks_bor = perform_random_walks(csr, hp, patches, inside=False, seed=0)
    assert walks_int.shape == (3, 3, 6)
    assert np.all(walks_int[2] == 0) and np.all(walks_bor[2] == 0)
    for p in range(2):
        members = set(patches[p][patches[p] != 0].tolist())
        in_border = {int(v) for v in members
                     if any((u + 1) not in members
                            for u in small_graph.neighbors(int(v) - 1))}
        for w in range(3):
            wi = walks_int[p, w]
            wi = wi[wi != 0].tolist()
            assert set(wi) <= members
            check_walk_valid(small_graph, wi)
            wb = walks_bor[p, w]
            wb = wb[wb != 0].tolist()
            if wb:
                assert wb[0] in in_border
                assert not (set(wb) & (members - in_border))
                check_walk_valid(small_graph, wb)


def test_sample_from_rows():
    rows = np.array([[3, 7, 9, 0], [5, 0, 0, 0], [0, 0, 0, 0]], dtype=np.int32)
    out = _sample_from_rows(rows, 50, np.random.default_rng(0))
    assert out.shape == (3, 50)
    assert set(out[0]) <= {3, 7, 9} and len(set(out[0])) == 3
    assert set(out[1]) == {5}
    assert set(out[2]) == {0}


def test_anchor_inits(small_graph, rng):
    csr = to_csr(small_graph)
    hp = HParams(n_layers=2, n_anchor_patches_N_in=4, n_anchor_patches_N_out=5,
                 n_anchor_patches_pos_in=3, n_anchor_patches_pos_out=6,
                 n_anchor_patches_structure=4)
    subgraphs = [(rng.choice(60, size=5, replace=False) + 1).tolist()
                 for _ in range(4)]
    from subgnn_tpu.data.dataset import initialize_cc_ids
    from subgnn_tpu.precompute.border import compute_border_sets
    cc_ids = initialize_cc_ids(csr, subgraphs)
    border = compute_border_sets(csr, cc_ids, 1)
    ai, ab = init_anchors_neighborhood(hp, cc_ids, border, seed=0, split_tag=0)
    assert ai.shape == (2, 4, cc_ids.shape[1], 4)
    assert ab.shape == (2, 4, cc_ids.shape[1], 5)
    # internal anchors must come from their own CC
    for l in range(2):
        for s in range(4):
            for c in range(cc_ids.shape[1]):
                comp = set(cc_ids[s, c].tolist()) - {0}
                got = set(ai[l, s, c].tolist()) - {0}
                assert got <= comp

    pi = init_anchors_pos_int(hp, subgraphs, seed=0, split_tag=0)
    assert pi.shape == (2, 4, 3)
    for l in range(2):
        for s in range(4):
            assert set(pi[l, s].tolist()) <= set(subgraphs[s])

    pe = init_anchors_pos_ext(hp, csr, seed=0)
    assert pe.shape == (2, 6)
    assert pe.min() >= 1

    pool = np.arange(1, 41, dtype=np.int32).reshape(10, 4)
    iw = rng.integers(1, 60, (10, 3, 6)).astype(np.int32)
    bw = rng.integers(1, 60, (10, 3, 6)).astype(np.int32)
    patches, idx, siw, sbw = init_anchors_structure(hp, pool, iw, bw, seed=0)
    assert patches.shape == (2, 4, 4) and idx.shape == (2, 4)
    assert np.array_equal(patches[0], pool[idx[0]])
    assert np.array_equal(siw[1], iw[idx[1]])
