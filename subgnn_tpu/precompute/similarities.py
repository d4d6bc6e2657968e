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
                                       cc_ids: np.ndarray) -> np.ndarray:
    """(n_subgraphs, max_n_cc, n_nodes) float32: hop distance from each CC to
    every node = min over the CC's rows of the all-pairs matrix.

    Faithful to reference SubGNN/SubGNN.py:752-781 including:
      * RAW hop distances (no reciprocal transform) — the MPN weights
        messages by these raw values,
      * node-id columns are 1-based model ids mapped to 0-based matrix rows,
      * padded CCs are filled with PAD_VALUE (0), which is also a legal
        distance value (quirk preserved).
    """
    n_sub, max_n_cc, _ = cc_ids.shape
    n_nodes = shortest_paths.shape[0]
    sims = np.full((n_sub, max_n_cc, n_nodes), float(PAD_VALUE), dtype=np.float32)
    for s in range(n_sub):
        for c in range(max_n_cc):
            comp = cc_ids[s, c]
            comp = comp[comp != PAD_VALUE]
            if comp.size:
                sims[s, c, :] = shortest_paths[comp - 1, :].min(axis=0)
    return sims


def compute_structure_similarities(graph: CSRGraph, cc_ids: np.ndarray,
                                   structure_anchors: np.ndarray,
                                   internal: bool) -> np.ndarray:
    """(n_subgraphs, max_n_cc, n_anchors) float32 DTW similarities between
    every CC and every pre-sampled structure anchor patch.

    Reference: SubGNN/SubGNN.py:783-833 (degree sequences via gamma.py, DTW
    via fastdtw + process pool). Here: batched exact DTW on device.
    Padded CCs are overwritten with PAD_VALUE (SubGNN.py:831).
    """
    n_sub, max_n_cc, L = cc_ids.shape
    comp_flat = cc_ids.reshape(n_sub * max_n_cc, L)
    comp_seqs, comp_lens = degree_sequences(graph, comp_flat, internal=internal)
    anchor_seqs, anchor_lens = degree_sequences(graph, structure_anchors,
                                                internal=internal)
    sims = dtw_similarity_matrix(comp_seqs, comp_lens, anchor_seqs, anchor_lens)
    sims = sims.reshape(n_sub, max_n_cc, -1).astype(np.float32)
    cc_mask = cc_ids[:, :, 0] != PAD_VALUE
    sims[~cc_mask] = PAD_VALUE
    return sims


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
