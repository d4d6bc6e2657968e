import numpy as np
import networkx as nx
import pytest

from subgnn_tpu.data.graph import CSRGraph
from subgnn_tpu.data.dataset import initialize_cc_ids
from subgnn_tpu.precompute.shortest_paths import (
    shortest_path_matrix, ego_graphs_1hop, degree_dict)
from subgnn_tpu.precompute.border import compute_border_sets
from subgnn_tpu.precompute.degree import degree_sequences
from subgnn_tpu.precompute.dtw import (
    dtw_distance_batch, dtw_similarity_matrix, dtw_host)
from subgnn_tpu.precompute.similarities import (
    compute_shortest_path_similarities, compute_structure_similarities)


def to_csr(g):
    edges = np.asarray(list(g.edges()), dtype=np.int64) + 1
    return CSRGraph.from_edges(edges, n_nodes=max(g.nodes()) + 1)


@pytest.fixture(params=["host", "device"])
def sp_backend(request):
    return request.param


def test_shortest_paths_vs_networkx(small_graph, sp_backend):
    csr = to_csr(small_graph)
    sp = shortest_path_matrix(csr, backend=sp_backend)
    expect = dict(nx.all_pairs_shortest_path_length(small_graph))
    for s in small_graph.nodes():
        for d in small_graph.nodes():
            assert sp[s, d] == expect[s].get(d, 0)


def test_shortest_paths_disconnected():
    # two components: 1-2-3 and 4-5 (1-based); unreached entries stay 0
    g = CSRGraph.from_edges(np.array([[1, 2], [2, 3], [4, 5]]), n_nodes=5)
    for backend in ("host", "device"):
        sp = shortest_path_matrix(g, backend=backend)
        assert sp[0, 1] == 1 and sp[0, 2] == 2
        assert sp[0, 3] == 0 and sp[0, 4] == 0  # unreached = 0 quirk
        assert sp[3, 4] == 1


def test_ego_and_degree_dicts(small_graph):
    csr = to_csr(small_graph)
    ego = ego_graphs_1hop(csr)
    deg = degree_dict(csr)
    for v in small_graph.nodes():
        assert sorted(ego[v]) == sorted(small_graph.neighbors(v))
        assert deg[v] == small_graph.degree(v)


def test_border_sets(small_graph, rng):
    csr = to_csr(small_graph)
    subgraphs = [(rng.choice(60, size=6, replace=False) + 1).tolist()
                 for _ in range(5)]
    cc_ids = initialize_cc_ids(csr, subgraphs)
    for radius in (1, 2):
        border = compute_border_sets(csr, cc_ids, radius)
        for s in range(len(subgraphs)):
            for c in range(cc_ids.shape[1]):
                comp = cc_ids[s, c]
                comp = comp[comp != 0]
                got = set(border[s, c][border[s, c] != 0].tolist())
                if comp.size == 0:
                    assert got == set()
                    continue
                expect = set()
                for v in comp:
                    expect |= {n + 1 for n in
                               nx.ego_graph(small_graph, int(v) - 1,
                                            radius=radius).nodes()}
                expect -= {int(v) for v in comp}
                assert got == expect


def test_degree_sequences(small_graph, rng):
    csr = to_csr(small_graph)
    sets = np.zeros((4, 8), dtype=np.int32)
    for i in range(3):
        nodes = rng.choice(60, size=5, replace=False) + 1
        sets[i, :5] = nodes
    seqs, lens = degree_sequences(csr, sets, internal=True)
    seqs_b, lens_b = degree_sequences(csr, sets, internal=False)
    for i in range(3):
        nodes = sets[i][sets[i] != 0]
        sub = small_graph.subgraph([n - 1 for n in nodes])
        internal = sorted(sub.degree(n - 1) for n in nodes)
        external = sorted(small_graph.degree(n - 1) - sub.degree(n - 1)
                          for n in nodes)
        assert seqs[i, :5].tolist() == internal and lens[i] == 5
        assert seqs_b[i, :5].tolist() == external and lens_b[i] == 5
    assert lens[3] == 0


def test_dtw_matches_host_oracle(rng):
    import jax.numpy as jnp
    N, La, Lb = 16, 9, 7
    lens_a = rng.integers(1, La + 1, N)
    lens_b = rng.integers(1, Lb + 1, N)
    a = np.zeros((N, La), np.float32)
    b = np.zeros((N, Lb), np.float32)
    for i in range(N):
        a[i, :lens_a[i]] = np.sort(rng.integers(0, 10, lens_a[i]))
        b[i, :lens_b[i]] = np.sort(rng.integers(0, 10, lens_b[i]))
    got = np.asarray(dtw_distance_batch(jnp.asarray(a), jnp.asarray(lens_a),
                                        jnp.asarray(b), jnp.asarray(lens_b)))
    for i in range(N):
        expect = dtw_host(a[i, :lens_a[i]], b[i, :lens_b[i]])
        assert abs(got[i] - expect) < 1e-4, (i, got[i], expect)


def test_dtw_empty_sequences():
    import jax.numpy as jnp
    a = jnp.zeros((2, 4)); b = jnp.ones((2, 3))
    d = dtw_distance_batch(a, jnp.array([0, 2]), b, jnp.array([3, 0]))
    assert np.allclose(np.asarray(d), 0.0)


def _ratio_dist(x, y):
    return (max(x, y) + 1) / (min(x, y) + 1) - 1


def test_dtw_vs_fastdtw(rng):
    """Quantify the documented deviation: our exact DTW vs the reference's
    fastdtw(radius=1) approximation (SubGNN/gamma.py:54-59), on
    degree-sequence-shaped pairs (sorted small ints, lengths 1..40)."""
    try:
        from fastdtw import fastdtw  # real package if present
    except ImportError:
        from tests.fastdtw_ref import fastdtw  # vendored Salvador&Chan 2007
    from subgnn_tpu.precompute.dtw import dtw_host as exact

    gaps = []
    for _ in range(200):
        a = np.sort(rng.integers(0, 12, rng.integers(1, 40)))
        b = np.sort(rng.integers(0, 12, rng.integers(1, 40)))
        approx, _ = fastdtw(a, b, dist=_ratio_dist)
        ex = exact(a, b)
        # exact DTW is a lower bound on any windowed approximation
        assert ex <= approx + 1e-9
        # deviation in the similarity space the model actually consumes
        gaps.append(abs(1.0 / (ex + 1.0) - 1.0 / (approx + 1.0)))
    gaps = np.asarray(gaps)
    # on sorted degree sequences the approximation is near-exact: the warp
    # path hugs the diagonal, which radius=1 covers (numbers in PARITY.md)
    assert np.mean(gaps == 0.0) > 0.5
    assert gaps.max() < 0.25 and gaps.mean() < 0.02


def test_vendored_fastdtw_exact_on_short_sequences(rng):
    """Below the coarsening threshold (len < radius+2) fastdtw is exact —
    the vendored implementation must match the exact DP there."""
    from tests.fastdtw_ref import fastdtw
    from subgnn_tpu.precompute.dtw import dtw_host as exact
    for _ in range(30):
        a = np.sort(rng.integers(0, 10, rng.integers(1, 3)))
        b = np.sort(rng.integers(0, 10, rng.integers(1, 3)))
        approx, path = fastdtw(a, b, dist=_ratio_dist)
        assert abs(approx - exact(a, b)) < 1e-9
        assert path[0] == (0, 0) and path[-1] == (len(a) - 1, len(b) - 1)


def test_shortest_path_similarities(small_graph, rng):
    csr = to_csr(small_graph)
    subgraphs = [(rng.choice(60, size=5, replace=False) + 1).tolist()
                 for _ in range(4)]
    cc_ids = initialize_cc_ids(csr, subgraphs)
    sp = shortest_path_matrix(csr, backend="host")
    sims = compute_shortest_path_similarities(sp, cc_ids)
    assert sims.shape == (4, cc_ids.shape[1], 60)
    for s in range(4):
        for c in range(cc_ids.shape[1]):
            comp = cc_ids[s, c]
            comp = comp[comp != 0]
            if comp.size == 0:
                assert np.all(sims[s, c] == 0)
            else:
                expect = sp[comp - 1].min(axis=0)
                assert np.allclose(sims[s, c], expect)


def test_structure_similarities(small_graph, rng):
    csr = to_csr(small_graph)
    subgraphs = [(rng.choice(60, size=5, replace=False) + 1).tolist()
                 for _ in range(3)]
    cc_ids = initialize_cc_ids(csr, subgraphs)
    anchors = np.zeros((4, 6), dtype=np.int32)
    for i in range(4):
        anchors[i, :4] = rng.choice(60, size=4, replace=False) + 1
    sims = compute_structure_similarities(csr, cc_ids, anchors, internal=True)
    assert sims.shape == (3, cc_ids.shape[1], 4)
    # oracle for one pair
    from subgnn_tpu.precompute.degree import degree_sequences as ds
    cseq, clen = ds(csr, cc_ids.reshape(-1, cc_ids.shape[2]), internal=True)
    aseq, alen = ds(csr, anchors, internal=True)
    expect = 1.0 / (dtw_host(cseq[0, :clen[0]], aseq[1, :alen[1]]) + 1.0)
    assert abs(sims[0, 0, 1] - expect) < 1e-5
    assert np.all(sims[:, :, :][cc_ids[:, :, 0] == 0] == 0)


def test_structure_similarities_both_matches_separate(small_graph, rng):
    """The serving hot path's single-dispatch fused internal+border DTW
    (structure_similarities_both) must equal the two separate
    compute_structure_similarities calls, and its anchor-sequence cache
    must be populated and reusable."""
    from subgnn_tpu.precompute.similarities import structure_similarities_both
    csr = to_csr(small_graph)
    subgraphs = [(rng.choice(60, size=5, replace=False) + 1).tolist()
                 for _ in range(3)]
    cc_ids = initialize_cc_ids(csr, subgraphs)
    anchors = np.zeros((4, 6), dtype=np.int32)
    for i in range(4):
        anchors[i, :4] = rng.choice(60, size=4, replace=False) + 1
    want_int = compute_structure_similarities(csr, cc_ids, anchors,
                                              internal=True)
    want_bor = compute_structure_similarities(csr, cc_ids, anchors,
                                              internal=False)
    cache = {}
    got_int, got_bor = structure_similarities_both(csr, cc_ids, anchors,
                                                   anchor_cache=cache)
    np.testing.assert_allclose(got_int, want_int, atol=1e-6)
    np.testing.assert_allclose(got_bor, want_bor, atol=1e-6)
    assert set(cache) == {"int", "bor"}
    # second call hits the cache and still agrees
    got_int2, got_bor2 = structure_similarities_both(csr, cc_ids, anchors,
                                                     anchor_cache=cache)
    np.testing.assert_allclose(got_int2, want_int, atol=1e-6)
    np.testing.assert_allclose(got_bor2, want_bor, atol=1e-6)


def test_host_fallback_bfs_matches_networkx(small_graph):
    """The pure-NumPy fallback (used when the C++ .so is absent) — exercised
    directly since backend='host' routes through native when available."""
    from subgnn_tpu.precompute.shortest_paths import _bfs_from_sources_host
    csr = to_csr(small_graph)
    sp = _bfs_from_sources_host(csr, np.arange(1, csr.n_nodes + 1))
    expect = dict(nx.all_pairs_shortest_path_length(small_graph))
    for s in small_graph.nodes():
        for d in small_graph.nodes():
            assert sp[s, d] == expect[s].get(d, 0)


def test_shortest_path_rows_matches_matrix(small_graph):
    """shortest_path_rows must equal the matching rows of the all-pairs
    matrix on both backends (native C++ when built, NumPy fallback)."""
    from subgnn_tpu.precompute.shortest_paths import shortest_path_rows
    from subgnn_tpu.ops import native
    csr = to_csr(small_graph)
    sp = shortest_path_matrix(csr, backend="host")
    srcs = np.array([3, 1, 17, 42], dtype=np.int64)
    rows = shortest_path_rows(csr, srcs, backend="fallback")
    assert np.array_equal(rows, sp[srcs - 1])
    if native.is_available():
        rows_native = shortest_path_rows(csr, srcs, backend="host")
        assert np.array_equal(rows_native, sp[srcs - 1])


def test_shortest_path_similarities_row_subset(small_graph, rng):
    """NP sims computed from a row-subset matrix (CC sources only, ids
    remapped into row space — the >_FULL_SP_MAX_NODES path in
    runner.precompute) must be identical to the full-matrix result."""
    from subgnn_tpu.precompute.shortest_paths import shortest_path_rows
    csr = to_csr(small_graph)
    subgraphs = [(rng.choice(60, size=5, replace=False) + 1).tolist()
                 for _ in range(4)]
    cc_ids = initialize_cc_ids(csr, subgraphs)
    sp = shortest_path_matrix(csr, backend="host")
    full = compute_shortest_path_similarities(sp, cc_ids)

    srcs = np.unique(cc_ids.ravel())
    srcs = srcs[srcs != 0].astype(np.int64)
    rows = shortest_path_rows(csr, srcs)
    lut = np.zeros(csr.n_nodes + 1, np.int32)
    lut[srcs] = np.arange(1, len(srcs) + 1, dtype=np.int32)
    subset = compute_shortest_path_similarities(rows, lut[cc_ids])
    assert subset.shape == full.shape
    assert np.array_equal(subset, full)


def test_dtw_similarity_matrix_multi_chunk(rng):
    """The on-device pair loop (one dispatch, lax.scan over chunk indices)
    must agree with the host oracle across chunk boundaries and padding
    (n_pairs deliberately not divisible by the chunk size)."""
    n_c, n_a, L = 13, 5, 6   # 65 pairs, chunk=16 -> 5 chunks, 15 pad slots
    comp = rng.integers(0, 9, (n_c, L)).astype(np.float32)
    comp_lens = rng.integers(1, L + 1, n_c).astype(np.int32)
    anch = rng.integers(0, 9, (n_a, L)).astype(np.float32)
    anch_lens = rng.integers(1, L + 1, n_a).astype(np.int32)
    for i in range(n_c):
        comp[i, comp_lens[i]:] = 0
    for i in range(n_a):
        anch[i, anch_lens[i]:] = 0
    sims = dtw_similarity_matrix(comp, comp_lens, anch, anch_lens, chunk=16)
    assert sims.shape == (n_c, n_a)
    for i in (0, 7, 12):
        for j in (0, 4):
            expect = 1.0 / (dtw_host(comp[i, :comp_lens[i]],
                                     anch[j, :anch_lens[j]]) + 1.0)
            assert abs(sims[i, j] - expect) < 1e-5


def test_border_sets_from_rows_matches_khop():
    """Serving derives border sets from BFS distance rows
    (border_sets_from_rows); it must equal compute_border_sets' CSR
    k-hop walk exactly — including multi-node CCs, radius 1 and 2,
    padded CCs, and nodes unreached across components."""
    import numpy as np
    from subgnn_tpu.data.graph import CSRGraph
    from subgnn_tpu.precompute.border import (border_sets_from_rows,
                                              compute_border_sets)
    from subgnn_tpu.precompute.shortest_paths import shortest_path_rows

    rng = np.random.default_rng(3)
    n = 40
    edges = rng.integers(1, n + 1, (120, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    g = CSRGraph.from_edges(edges, n_nodes=n)

    cc_ids = np.zeros((5, 3, 4), np.int32)
    for s in range(5):
        for c in range(int(rng.integers(1, 4))):
            ln = int(rng.integers(1, 5))
            cc_ids[s, c, :ln] = rng.choice(n, size=ln, replace=False) + 1

    srcs = np.unique(cc_ids.ravel())
    srcs = srcs[srcs != 0].astype(np.int64)
    rows = shortest_path_rows(g, srcs)
    for radius in (1, 2):
        a = compute_border_sets(g, cc_ids, radius)
        b = border_sets_from_rows(srcs, rows, cc_ids, radius, n)
        assert a.shape == b.shape, (radius, a.shape, b.shape)
        np.testing.assert_array_equal(a, b, err_msg=f"radius={radius}")
