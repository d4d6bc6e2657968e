"""Hand-derived reference-semantics fixtures (VERDICT round-1 item 8).

Each expectation below was derived BY HAND from the reference source —
not from this repo's oracle code — so a shared misreading of the reference
cannot make these pass:

  * S-channel `anchors_sim_index` gather (SubGNN/subgraph_mpn.py:73-103):
    `anchors_sim_index * torch.unique(edge_index[1]).shape[0]` is PYTHON
    LIST REPETITION — the per-layer anchor column list is tiled across the
    non-padded CCs, so every CC reads the SAME similarity columns. A
    scalar-multiply misreading (columns [k*n_cc]) would fail this fixture.
  * Border-walk membership (SubGNN/anchor_patch_samplers.py:49-158 +
    subgraph_utils.py:126-144): walks start at in-border patch nodes
    (patch nodes with >=1 external edge), every step stays inside
    in_border ∪ external, and interior patch nodes are NEVER visited.
  * N/P per-edge similarity gather (subgraph_mpn.py:92-94):
    sims[cc, anchor_node_id - 1] — 1-based ids into 0-based columns.

(Internal walks need no such fixture: the reference runs them on the
patch-induced subgraph, and since every candidate node lies in the patch,
the induced-subgraph triangle test provably equals the base-graph test
restricted to patch candidates — the two readings coincide.)
"""
import numpy as np
import jax
import jax.numpy as jnp

from subgnn_tpu.data.graph import CSRGraph
from subgnn_tpu.models.mpn import mpn_layer
from subgnn_tpu.sampling.walks import perform_random_walks


class _HP:
    n_triangular_walks = 8
    random_walk_len = 6
    rw_beta = 0.5


def _fixture_graph():
    # 1-2, 2-3 internal to patch {1,2,3}; 2-4 is its only external edge;
    # 4-5-6-7 a tail. Hand-derived border-walk facts for patch {1,2,3}:
    #   in_border = {2}  (1 and 3 have no external edges -> interior)
    #   valid     = {2} ∪ {4,5,6,7}
    #   step 1 is forced: N(2)={1,3,4}, restricted to valid -> {4}
    edges = np.array([[1, 2], [2, 3], [2, 4], [4, 5], [5, 6], [6, 7]])
    return CSRGraph.from_edges(edges, n_nodes=7)


def test_border_walk_membership_fixture():
    g = _fixture_graph()
    patches = np.array([[1, 2, 3, 0]], dtype=np.int32)
    edge_set = {(1, 2), (2, 3), (2, 4), (4, 5), (5, 6), (6, 7)}
    edge_set |= {(b, a) for a, b in edge_set}
    for seed in range(5):
        walks = perform_random_walks(g, _HP, patches, inside=False, seed=seed)
        assert walks.shape == (1, 8, 6)
        for w in range(8):
            walk = walks[0, w]
            walk = walk[walk != 0].tolist()
            assert walk[0] == 2, walk           # start ∈ in_border = {2}
            assert walk[1] == 4, walk           # forced first step
            assert not set(walk) & {1, 3}, walk  # interior nodes excluded
            assert set(walk) <= {2, 4, 5, 6, 7}, walk
            for a, b in zip(walk, walk[1:]):    # steps follow real edges
                assert (a, b) in edge_set, walk


def test_internal_walk_dead_end_fixture():
    # patch {7}: 7's only neighbor (6) is outside the patch, so the walk is
    # [7] and the row stays PAD elsewhere (anchor_patch_samplers.py:84,94)
    g = _fixture_graph()
    walks = perform_random_walks(g, _HP, np.array([[7, 0]], np.int32),
                                 inside=True, seed=0)
    assert walks[0, :, 0].tolist() == [7] * 8
    assert np.all(walks[0, :, 1:] == 0)


def test_internal_walk_stays_in_patch():
    g = _fixture_graph()
    for seed in range(5):
        walks = perform_random_walks(g, _HP, np.array([[4, 5, 6, 0]], np.int32),
                                     inside=True, seed=seed)
        vis = set(walks[walks != 0].tolist())
        assert vis <= {4, 5, 6}


def test_structure_sim_index_gather_fixture():
    # sims[b,c,o] = 100b + 10c + o ; anchors_sim_index = [3, 0] ;
    # subgraph 1's second CC is padded.
    # Reference hand-simulation (subgraph_mpn.py:73-103): flattened sims has
    # rows (b0c0, b0c1, b1c0, b1c1); 3 non-pad CCs; the list-repetition
    # quirk tiles [3,0] across them, so per-edge sims are
    #   cc(b0c0): cols 3,0 -> 3, 0
    #   cc(b0c1): cols 3,0 -> 13, 10
    #   cc(b1c0): cols 3,0 -> 103, 100
    # and scatter-add aggregation with all-ones anchor embeds gives
    #   agg = [[3+0, 13+10], [103+100, 0]] = [[3, 23], [203, 0]].
    b, c, o = np.meshgrid(np.arange(2), np.arange(2), np.arange(5),
                          indexing="ij")
    sims = jnp.asarray(100.0 * b + 10.0 * c + o, jnp.float32)  # (2,2,5)
    pool_idx = jnp.array([3, 0])
    cc_mask = jnp.array([[True, True], [True, False]])

    gathered = sims[:, :, pool_idx]
    assert gathered.tolist() == [[[3, 0], [13, 10]],
                                 [[103, 100], [113, 110]]]

    D = 4
    params = {
        "linear": {"w": jnp.zeros((2 * D, D)), "b": jnp.zeros((D,))},
        "linear_position": {"w": jnp.ones((D, 1)), "b": jnp.zeros((1,))},
    }
    valid = jnp.broadcast_to(cc_mask[:, :, None], (2, 2, 2))
    agg, prop = mpn_layer(params, jnp.zeros((2, 2, D)), jnp.ones((2, 2, D)),
                          gathered, valid, use_mpn_projection=False,
                          layout="per_subgraph")
    expect_agg = np.array([[3.0, 23.0], [203.0, 0.0]])
    assert np.allclose(np.asarray(agg), expect_agg[:, :, None])
    # property head: relu(sim * (1-vector @ ones) ) = 4 * masked sims
    expect_prop = np.array([[[3, 0], [13, 10]], [[103, 100], [0, 0]]]) * 4.0
    assert np.allclose(np.asarray(prop), expect_prop)


def test_np_sim_gather_fixture():
    # N/P channels: per-edge sim = sims[cc, anchor_node_id - 1]
    # (subgraph_mpn.py:92-94). Anchor node ids 5 and 2 read columns 4 and 1.
    sims = jnp.arange(2 * 1 * 6, dtype=jnp.float32).reshape(2, 1, 6)
    ids_out = jnp.array([5, 2])
    got = sims[:, :, ids_out - 1]
    assert got.tolist() == [[[4.0, 1.0]], [[10.0, 7.0]]]
