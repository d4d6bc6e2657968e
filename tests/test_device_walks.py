import numpy as np
import networkx as nx

import jax
import jax.numpy as jnp

from subgnn_tpu.data.graph import CSRGraph
from subgnn_tpu.config import HParams
from subgnn_tpu.sampling.device_walks import (
    padded_neighbor_table, triangular_walks_device,
    sample_structure_pool_device)


def to_csr(g):
    edges = np.asarray(list(g.edges()), dtype=np.int64) + 1
    return CSRGraph.from_edges(edges, n_nodes=max(g.nodes()) + 1)


def test_device_walks_valid_edges(small_graph):
    csr = to_csr(small_graph)
    table, deg = padded_neighbor_table(csr)
    walks = triangular_walks_device(
        table, deg, jnp.asarray(csr.node_ids()), jax.random.PRNGKey(0),
        walk_len=10, n_walks=64, rw_beta=0.7)
    walks = np.asarray(walks)
    assert walks.shape == (64, 10)
    for w in walks:
        real = w[w != 0]
        assert len(real) >= 1
        # walks are contiguous: pads only at the tail
        assert not (w[np.argmin(w != 0):] != 0).any() or (w != 0).all()
        for a, b in zip(real, real[1:]):
            assert small_graph.has_edge(int(a) - 1, int(b) - 1), (a, b)


def test_device_walks_triangle_bias():
    # triangle 1-2-3 plus pendant 4 on node 2 (as in the host sampler test)
    g = CSRGraph.from_edges(np.array([[1, 2], [2, 3], [1, 3], [2, 4]]), 4)
    table, deg = padded_neighbor_table(g)
    walks = np.asarray(triangular_walks_device(
        table, deg, jnp.asarray(np.array([1], np.int32)),
        jax.random.PRNGKey(1), walk_len=3, n_walks=4096, rw_beta=0.9))
    mask = (walks[:, 0] == 1) & (walks[:, 1] == 2)
    assert mask.sum() > 500
    frac_tri = (walks[mask, 2] == 3).mean()
    assert frac_tri > 0.8, frac_tri


def test_device_pool_matches_host_contract(small_graph):
    csr = to_csr(small_graph)
    hp = HParams(n_layers=2, n_anchor_patches_structure=4, max_sim_epochs=2,
                 sample_walk_len=12, rw_beta=0.5)
    pool = sample_structure_pool_device(csr, hp, seed=0, max_sim_epochs=2)
    assert pool.shape[0] == 2 * 4 * 2
    assert pool.dtype == np.int32
    for p in pool:
        real = p[p != 0]
        assert len(real) >= 1
        for a, b in zip(real, real[1:]):
            assert small_graph.has_edge(int(a) - 1, int(b) - 1)
    # determinism
    pool2 = sample_structure_pool_device(csr, hp, seed=0, max_sim_epochs=2)
    np.testing.assert_array_equal(pool, pool2)
