"""Graph partitioning + distributed BFS with explicit frontier exchange.

SURVEY §2.3 names `graph-partitioner` and `distributed BFS` as green-field
deliverables (the reference computes all-pairs shortest paths with SNAP on
one host, prepare_dataset/precompute_graph_metrics.py:61-70). Two
decompositions exist in this repo:

  * source partitioning (precompute/shortest_paths.py `_bfs_device`):
    each device runs independent BFS sources against a REPLICATED
    adjacency — zero collectives, but every device stores the whole graph;
  * graph partitioning (this module): the adjacency is EDGE-PARTITIONED by
    destination-node column blocks, each device stores only its 1/D block,
    and every BFS level performs an explicit frontier exchange — an
    `all_gather` of the per-device frontier columns over ICI — before the
    local masked-SpMV expansion (shard_map, collectives visible in the
    program). This is the decomposition that scales past single-device
    graph memory; at n=30k the dense bool adjacency is 900 MB replicated
    vs 112 MB/device on 8 chips.

The level loop is a lax.while_loop whose continuation predicate is a
psum-reduced global frontier population — all devices agree on termination
without host round-trips.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def padded_adjacency(graph, n_parts: int) -> Tuple[np.ndarray, int]:
    """(n_pad, n_pad) bool adjacency over 0-based raw node ids, zero-padded
    so the column axis splits evenly into n_parts equal-width blocks —
    device d's edge partition is columns [d*w, (d+1)*w). Built once (no
    per-block copies: at n=30k the bool matrix is already 900 MB) and
    vectorized straight off the CSR."""
    n = graph.n_nodes
    n_pad = -(-n // n_parts) * n_parts
    adj = np.zeros((n_pad, n_pad), dtype=bool)
    counts = np.diff(graph.indptr[1:]).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    adj[rows, graph.indices[graph.indptr[1]:] - 1] = True
    return adj, n_pad


def bfs_graph_partitioned(graph, mesh, chunk: int = 256) -> np.ndarray:
    """All-pairs BFS distance matrix with the GRAPH partitioned over every
    device of `mesh` (flattened to one axis). Semantics identical to the
    host BFS including the unreached=0 artifact
    (reference: precompute_graph_metrics.py:23-26).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    shard_map = jax.shard_map

    devices = np.asarray(mesh.devices).reshape(-1)
    n_dev = devices.size
    flat_mesh = Mesh(devices, ("dev",))

    n = graph.n_nodes
    adj_np, n_pad = padded_adjacency(graph, n_dev)
    # ship the BOOL matrix (1 B/entry over the host link), column-sharded:
    # device d's shard IS its edge partition; the float cast for the MXU
    # SpMV happens once per device below
    adj_sharded = jax.device_put(
        jnp.asarray(adj_np), NamedSharding(flat_mesh, P(None, "dev")))

    @jax.jit
    def bfs_chunk(adj, src_onehot):
        # adj: (n_pad, n_pad) bool column-sharded; src_onehot: (S, n_pad)

        def local(adj_local, src_local):
            # adj_local: (n_pad, w); src_local: (S, w) — this device's
            # destination columns of the frontier/visited/dist state
            adj_local = adj_local.astype(jnp.float32)
            def cond(state):
                _, _, _, _, n_active = state
                return n_active > 0

            def body(state):
                frontier_local, visited, dist, d, _ = state
                # FRONTIER EXCHANGE: gather every device's frontier columns
                frontier_full = jax.lax.all_gather(
                    frontier_local, "dev", axis=1, tiled=True)   # (S, n_pad)
                nxt = (frontier_full.astype(jnp.float32) @ adj_local) > 0
                new = nxt & ~visited
                dist = jnp.where(new, d + 1, dist)
                n_active = jax.lax.psum(new.sum(), "dev")
                return new, visited | new, dist, d + 1, n_active

            # derive the dist carry from src_local so it is marked varying
            # over 'dev' like the body's output (shard_map vma tracking)
            state = (src_local, src_local,
                     src_local.astype(jnp.int32) * 0, jnp.int32(0),
                     jnp.int32(1))
            _, _, dist, _, _ = jax.lax.while_loop(cond, body, state)
            return dist

        return shard_map(local, mesh=flat_mesh,
                         in_specs=(P(None, "dev"), P(None, "dev")),
                         out_specs=P(None, "dev"))(adj, src_onehot)

    out = np.zeros((n, n), dtype=np.int32)
    src_sharding = NamedSharding(flat_mesh, P(None, "dev"))
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        # per-chunk one-hot source rows (a full n_pad x n_pad eye would be
        # a second O(n^2) host allocation — the exact wall this module
        # exists to avoid); padded rows stay all-zero = dist 0 everywhere
        rows = np.zeros((chunk, n_pad), dtype=bool)
        rows[np.arange(stop - start), np.arange(start, stop)] = True
        src = jax.device_put(jnp.asarray(rows), src_sharding)
        res = np.asarray(bfs_chunk(adj_sharded, src))
        out[start:stop] = res[: stop - start, :n]
    return out
