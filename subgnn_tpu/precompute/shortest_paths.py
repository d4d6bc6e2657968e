"""All-pairs BFS shortest-path matrix.

Replaces the reference's SNAP-based precompute
(reference: prepare_dataset/precompute_graph_metrics.py:20-70), preserving its
output contract: a dense (n_raw, n_raw) float matrix indexed by RAW 0-based
node id where entry [s, d] is the hop distance and UNREACHED nodes are left
at 0 (the np.zeros fill artifact at precompute_graph_metrics.py:23-26).

Two backends:
  * 'host'   — vectorized frontier-expansion BFS over the CSR arrays in
               NumPy (scipy-free, C-speed via bincount/flatnonzero).
  * 'device' — iterated masked SpMV on TPU: the frontier of a chunk of
               sources is a (S, n) bool matrix; one step is a bool matmul
               against the dense adjacency (MXU-friendly for n up to a few
               thousand). Used for synthetic-scale graphs; large graphs
               stay on the host path.
"""
from __future__ import annotations

import numpy as np

from ..data.graph import CSRGraph


def _bfs_from_sources_host(graph: CSRGraph, sources: np.ndarray) -> np.ndarray:
    """(len(sources), n_nodes) int32 hop distances, unreached = 0."""
    n = graph.n_nodes
    indptr, indices = graph.indptr, graph.indices
    out = np.zeros((len(sources), n), dtype=np.int32)
    for i, s in enumerate(sources):
        dist = out[i]
        visited = np.zeros(n + 1, dtype=bool)
        visited[s] = True
        frontier = np.array([s], dtype=np.int64)
        d = 0
        while frontier.size:
            d += 1
            # gather all neighbors of the frontier in one shot
            starts = indptr[frontier]
            ends = indptr[frontier + 1]
            total = int((ends - starts).sum())
            if total == 0:
                break
            # flat CSR-row gather with no per-node Python loop: element k of
            # row j sits at indices[starts[j] + k]
            counts = ends - starts
            row_start = np.cumsum(counts) - counts
            offs = np.repeat(starts - row_start, counts) + np.arange(total)
            nbr = indices[offs]
            new = np.unique(nbr[~visited[nbr]])
            if new.size == 0:
                break
            visited[new] = True
            dist[new - 1] = d  # raw 0-based output indexing
            frontier = new
    return out


def _bfs_device(graph: CSRGraph, chunk: int = 256, mesh=None) -> np.ndarray:
    """Dense-adjacency BFS on the default JAX device.

    dist[k] is written when a node first enters the frontier at step k; the
    loop runs until every frontier is empty (lax.while_loop, no host sync
    per level). With a mesh the BFS-source axis of each chunk shards over
    every device (independent sources — the masked SpMV runs 1/n-tall per
    device against the replicated adjacency; this is the distributed-BFS
    deliverable of SURVEY §2.3 in its TPU-natural form: partition sources,
    not the frontier of one source).
    """
    import jax
    import jax.numpy as jnp

    n = graph.n_nodes
    # dense adjacency over raw 0-based ids
    adj = np.zeros((n, n), dtype=bool)
    for v in range(1, n + 1):
        adj[v - 1, graph.neighbors(v) - 1] = True
    adj = jnp.asarray(adj)

    src_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        n_dev = int(np.prod(list(mesh.shape.values())))
        chunk = -(-chunk // n_dev) * n_dev
        src_sharding = NamedSharding(
            mesh, PartitionSpec(tuple(mesh.axis_names)))
        adj = jax.device_put(adj, NamedSharding(mesh, PartitionSpec()))

    # adj is a jit ARGUMENT (closed-over device arrays get embedded in the
    # serialized HLO, overflowing the axon remote-compile limit at scale)
    @jax.jit
    def bfs_chunk(adj, src_onehot):
        # src_onehot: (S, n) bool
        def cond(state):
            frontier, visited, dist, d = state
            return frontier.any()

        def body(state):
            frontier, visited, dist, d = state
            nxt = (frontier.astype(jnp.float32) @ adj.astype(jnp.float32)) > 0
            new = nxt & ~visited
            dist = jnp.where(new, d + 1, dist)
            return new, visited | new, dist, d + 1

        visited = src_onehot
        dist = jnp.zeros(src_onehot.shape, jnp.int32)
        frontier = src_onehot
        _, _, dist, _ = jax.lax.while_loop(cond, body, (frontier, visited, dist, jnp.int32(0)))
        return dist

    def put(rows):
        rows = jnp.asarray(rows)
        return (jax.device_put(rows, src_sharding)
                if src_sharding is not None else rows)

    out = np.zeros((n, n), dtype=np.int32)
    eye = np.eye(n, dtype=bool)
    for start in range(0, n, chunk):
        rows = eye[start:start + chunk]
        if rows.shape[0] < chunk:  # pad to static shape
            pad = np.zeros((chunk - rows.shape[0], n), dtype=bool)
            res = np.asarray(bfs_chunk(adj, put(np.concatenate([rows, pad]))))
            out[start:start + rows.shape[0]] = res[: rows.shape[0]]
        else:
            out[start:start + chunk] = np.asarray(bfs_chunk(adj, put(rows)))
    return out


def shortest_path_matrix(graph: CSRGraph, backend: str = "auto",
                         mesh=None, partition: str = "sources",
                         n_threads: int = 0) -> np.ndarray:
    """Dense (n, n) all-pairs hop-distance matrix over RAW 0-based ids.

    backend: 'host' | 'device' | 'auto'. Auto prefers the multithreaded
    C++ host kernel whenever it is available (it beats the dense device
    SpMV at every shipped size and avoids remote round trips) and uses
    the device backend only as the n <= 4096 fallback without a native
    toolchain.
    A mesh forces the device backend; partition picks the decomposition:
    'sources' shards independent BFS sources against a replicated
    adjacency (no collectives), 'graph' edge-partitions the adjacency
    itself with an all-gather frontier exchange per level
    (parallel/partition.py) — use it when the graph exceeds one device.
    n_threads caps the C++ host kernel's thread pool (0 = all hardware
    threads) — the hp.n_processes knob, reference SubGNN's
    multiprocessing pool size (precompute_graph_metrics.py:66).
    """
    n = graph.n_nodes
    from ..ops import native
    if mesh is not None:
        if partition == "graph":
            from ..parallel.partition import bfs_graph_partitioned
            return bfs_graph_partitioned(graph, mesh)
        return _bfs_device(graph, mesh=mesh)
    if backend == "auto":
        # the multithreaded C++ host kernel beats the dense device SpMV for
        # every shipped graph size (and avoids remote-device round trips);
        # 'device' remains available explicitly
        backend = "host" if native.is_available() or n > 4096 else "device"
    if backend == "device":
        return _bfs_device(graph)
    if native.is_available():
        return native.bfs_all_pairs(graph, n_threads=n_threads)
    sources = np.arange(1, n + 1, dtype=np.int64)
    return _bfs_from_sources_host(graph, sources)


def shortest_path_rows(graph: CSRGraph, sources: np.ndarray,
                       backend: str = "auto",
                       n_threads: int = 0) -> np.ndarray:
    """(len(sources), n) int32 hop distances from each 1-based source node
    (unreached = 0) — the subset-of-sources counterpart to
    shortest_path_matrix. The N/P similarity precompute only needs
    distances FROM the subgraph/CC nodes (reference SubGNN.py:752-781
    indexes only those rows of the all-pairs matrix), so at EM-USER scale
    (57k nodes, ~6k subgraph nodes) this avoids building and saving the
    n^2 matrix (13 GB) entirely."""
    sources = np.ascontiguousarray(sources, dtype=np.int64)
    from ..ops import native
    if backend not in ("auto", "host", "fallback"):
        raise ValueError(
            f"shortest_path_rows backend={backend!r}: only 'auto', 'host' "
            "(C++ threads) and 'fallback' (NumPy) exist — there is no "
            "device variant for source subsets")
    if backend in ("auto", "host") and native.is_available():
        return native.bfs_from_sources(graph, sources, n_threads=n_threads)
    return _bfs_from_sources_host(graph, sources)


def ego_graphs_1hop(graph: CSRGraph) -> dict:
    """{raw 0-based id: [raw 0-based 1-hop neighbor ids]} — same content as
    the reference's ego_graphs.txt (precompute_graph_metrics.py:34-45)."""
    return {v - 1: (graph.neighbors(v) - 1).tolist()
            for v in range(1, graph.n_nodes + 1)}


def degree_dict(graph: CSRGraph) -> dict:
    """{raw 0-based id: degree} — same content as degree_sequence.txt
    (precompute_graph_metrics.py:47-59)."""
    deg = graph.degrees
    return {v - 1: int(deg[v]) for v in range(1, graph.n_nodes + 1)}
