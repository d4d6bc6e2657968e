"""Channel similarity precompute: N/P shortest-path sims, S DTW sims.

Artifact filenames follow the reference's cache-key scheme so caches are
interchangeable (reference: SubGNN/SubGNN.py:852-854, 893, 904, 913,
926-931).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..data.graph import CSRGraph
from .degree import degree_sequences
from .dtw import dtw_similarity_matrix

PAD_VALUE = 0


def compute_shortest_path_similarities(shortest_paths: np.ndarray,
                                       cc_ids: np.ndarray,
                                       mesh=None) -> np.ndarray:
    """(n_subgraphs, max_n_cc, n_nodes) float32: hop distance from each CC to
    every node = min over the CC's rows of the all-pairs matrix.

    Faithful to reference SubGNN/SubGNN.py:752-781 including:
      * RAW hop distances (no reciprocal transform) — the MPN weights
        messages by these raw values,
      * node-id columns are 1-based model ids mapped to 0-based matrix rows,
      * padded CCs are filled with PAD_VALUE (0), which is also a legal
        distance value (quirk preserved).

    shortest_paths may be the square (n, n) all-pairs matrix, or a
    row-subset (k, n) matrix from shortest_path_rows with cc_ids already
    remapped into 1-based row space (runner._np_sim_inputs) — only the row
    height differs; columns are always the full raw-0-based node axis.

    With a mesh the reduction runs on device: the path matrix is resident
    once with its column axis sharded over every mesh device and the
    min-over-CC-rows accumulates as a scan over the CC length, so each
    device only ever touches its 1/n column shard (this is the
    n_nodes-axis analog of the model-side NP-sim sharding).
    """
    n_sub, max_n_cc, _ = cc_ids.shape
    n_nodes = shortest_paths.shape[1]
    if mesh is not None:
        return _shortest_path_similarities_device(shortest_paths, cc_ids,
                                                  mesh)
    sims = np.full((n_sub, max_n_cc, n_nodes), float(PAD_VALUE), dtype=np.float32)
    for s in range(n_sub):
        for c in range(max_n_cc):
            comp = cc_ids[s, c]
            comp = comp[comp != PAD_VALUE]
            if comp.size:
                sims[s, c, :] = shortest_paths[comp - 1, :].min(axis=0)
    return sims


def _shortest_path_similarities_device(shortest_paths: np.ndarray,
                                       cc_ids: np.ndarray, mesh,
                                       chunk: int = 512) -> np.ndarray:
    """Mesh-sharded CC-min reduction (see compute_shortest_path_similarities).

    The (n, n) matrix stays device-resident across chunks sharded
    P(None, devices) on columns; per chunk of subgraphs a lax.scan over the
    CC length gathers one row per (subgraph, cc) and min-accumulates, so
    peak per-device memory is the matrix shard + one (chunk, C, n/n_dev)
    accumulator.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_sub, max_n_cc, L = cc_ids.shape
    n_rows, n_nodes = shortest_paths.shape
    axes = tuple(mesh.axis_names)
    col_sharding = NamedSharding(mesh, P(None, axes))
    n_dev = int(np.prod(list(mesh.shape.values())))
    pad_cols = (-n_nodes) % n_dev
    sp = np.asarray(shortest_paths, np.float32)
    if pad_cols:
        sp = np.concatenate(
            [sp, np.zeros((n_rows, pad_cols), np.float32)], axis=1)
    sp_dev = jax.device_put(jnp.asarray(sp), col_sharding)

    @jax.jit
    def reduce_chunk(sp_dev, ids):
        # ids: (B, C, L) 1-based, PAD=0
        def body(acc, l):
            col = ids[:, :, l]                             # (B, C)
            rows = sp_dev[jnp.clip(col - 1, 0, n_rows - 1)]  # (B, C, n)
            rows = jnp.where((col != PAD_VALUE)[:, :, None], rows, jnp.inf)
            return jnp.minimum(acc, rows), None

        acc0 = jnp.full((ids.shape[0], max_n_cc, sp_dev.shape[1]), jnp.inf,
                        jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, jnp.arange(L))
        # empty CCs -> PAD fill (quirk preserved)
        return jnp.where(jnp.isinf(acc), float(PAD_VALUE), acc)

    out = np.empty((n_sub, max_n_cc, n_nodes), np.float32)
    for s in range(0, n_sub, chunk):
        e = min(s + chunk, n_sub)
        ids = cc_ids[s:e]
        if e - s < chunk:  # pad to the compiled shape
            ids = np.concatenate(
                [ids, np.zeros((chunk - (e - s), max_n_cc, L),
                               cc_ids.dtype)], axis=0)
        res = np.asarray(reduce_chunk(sp_dev, jnp.asarray(ids)))
        out[s:e] = res[: e - s, :, :n_nodes]
    return out


def compute_structure_similarities(graph: CSRGraph, cc_ids: np.ndarray,
                                   structure_anchors: np.ndarray,
                                   internal: bool, mesh=None) -> np.ndarray:
    """(n_subgraphs, max_n_cc, n_anchors) float32 DTW similarities between
    every CC and every pre-sampled structure anchor patch.

    Reference: SubGNN/SubGNN.py:783-833 (degree sequences via gamma.py, DTW
    via fastdtw + process pool). Here: batched exact DTW on device; with a
    mesh the (CC x anchor) pair axis data-parallelizes over every device.
    Padded CCs are overwritten with PAD_VALUE (SubGNN.py:831).
    """
    n_sub, max_n_cc, L = cc_ids.shape
    comp_flat = cc_ids.reshape(n_sub * max_n_cc, L)
    comp_seqs, comp_lens = degree_sequences(graph, comp_flat, internal=internal)
    anchor_seqs, anchor_lens = degree_sequences(graph, structure_anchors,
                                                internal=internal)
    sims = dtw_similarity_matrix(comp_seqs, comp_lens, anchor_seqs,
                                 anchor_lens, mesh=mesh)
    sims = sims.reshape(n_sub, max_n_cc, -1).astype(np.float32)
    cc_mask = cc_ids[:, :, 0] != PAD_VALUE
    sims[~cc_mask] = PAD_VALUE
    return sims


def structure_similarities_both(graph: CSRGraph, cc_ids: np.ndarray,
                                structure_anchors: np.ndarray,
                                anchor_cache: dict | None = None):
    """Internal AND border structure similarities in ONE device dispatch
    (serving hot path; equals two compute_structure_similarities calls).

    anchor_cache: a dict the caller keeps per anchor pool — the pool's
    degree sequences are request-invariant, so a warm serving path skips
    recomputing them (a host loop over every pool walk, paid twice per
    request before round 4). Returns (int_sims, bor_sims) shaped like
    compute_structure_similarities's output.
    """
    from .dtw import dtw_similarity_grouped

    n_sub, max_n_cc, L = cc_ids.shape
    comp_flat = cc_ids.reshape(n_sub * max_n_cc, L)
    ci, li = degree_sequences(graph, comp_flat, internal=True)
    cb, lb = degree_sequences(graph, comp_flat, internal=False)
    if anchor_cache is None:
        anchor_cache = {}
    if "int" not in anchor_cache:
        anchor_cache["int"] = degree_sequences(graph, structure_anchors,
                                               internal=True)
        anchor_cache["bor"] = degree_sequences(graph, structure_anchors,
                                               internal=False)
    (ai, ali), (ab, alb) = anchor_cache["int"], anchor_cache["bor"]
    sims = dtw_similarity_grouped(
        np.stack([ci, cb]), np.stack([li, lb]),
        np.stack([ai, ab]), np.stack([ali, alb]))
    cc_mask = cc_ids[:, :, 0] != PAD_VALUE
    out = []
    for g in range(2):
        s = sims[g].reshape(n_sub, max_n_cc, -1).astype(np.float32)
        s[~cc_mask] = PAD_VALUE
        out.append(s)
    return out[0], out[1]


# --------------------------------------------------------------------- cache

def cached(path: Path, compute_fn, recompute: bool = False) -> np.ndarray:
    """Load a .npy artifact or compute+save it (reference caching pattern,
    SubGNN/SubGNN.py:856-873)."""
    path = Path(path)
    if path.exists() and not recompute:
        return np.load(path, allow_pickle=True)
    arr = compute_fn()
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path, arr)
    return arr


def np_sim_path(sim_dir: Path, split: str) -> Path:
    return Path(sim_dir) / f"{PAD_VALUE}_{split}_similarities.npy"


def border_set_path(sim_dir: Path, radius: int, split: str) -> Path:
    return Path(sim_dir) / f"{radius}_{PAD_VALUE}_{split}_border_set.npy"


def struc_patches_path(sim_dir: Path, hp) -> Path:
    return Path(sim_dir) / (
        f"struc_patches_{hp.sample_walk_len}_{hp.structure_patch_type}_"
        f"{hp.max_sim_epochs}.npy")


def struc_walks_path(sim_dir: Path, hp, internal: bool) -> Path:
    pre = "int" if internal else "bor"
    return Path(sim_dir) / (
        f"{pre}_struc_patch_random_walks_{hp.n_triangular_walks}_"
        f"{hp.random_walk_len}_{hp.sample_walk_len}_"
        f"{hp.structure_patch_type}_{hp.max_sim_epochs}.npy")


def struc_sim_path(sim_dir: Path, hp, internal: bool, split: str) -> Path:
    pre = "int" if internal else "bor"
    suffix = ("_" + hp.structure_similarity_fn
              if hp.structure_similarity_fn != "dtw" else "")
    return Path(sim_dir) / (
        f"{pre}_struc_{hp.sample_walk_len}_{hp.structure_patch_type}_"
        f"{hp.max_sim_epochs}_{PAD_VALUE}{suffix}_{split}_similarities.npy")
