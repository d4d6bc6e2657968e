"""ctypes loader for the native C++ host kernels
(subgnn_tpu/native/subgnn_native.cpp — shipped as package data).

Compiles the shared library on first use (g++, cached beside the source,
or under ~/.cache/subgnn_tpu when the install dir is read-only) and
exposes:
  * bfs_all_pairs(graph) -> (n, n) int32 hop distances (exact same contract
    as the NumPy host backend; auto-used by precompute.shortest_paths when
    available),
  * triangular_walks_full(graph, ...) -> batched structure-pool walks
    (different RNG stream than the Python sampler — identical distribution;
    opt-in via use_native=True because cached artifacts are stream-specific).

If no compiler is available the module degrades gracefully: is_available()
returns False and callers fall back to the NumPy paths.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parents[1] / "native" / "subgnn_native.cpp"


def _lib_dir() -> Path:
    import os
    # a prebuilt library beside the source (e.g. built once by root in a
    # system install) is usable read-only — prefer it over forcing every
    # user into a per-user cache rebuild
    if (os.access(_SRC.parent, os.W_OK)
            or (_SRC.parent / "libsubgnn_native.so").exists()):
        return _SRC.parent
    d = Path.home() / ".cache" / "subgnn_tpu"
    d.mkdir(parents=True, exist_ok=True)
    return d


_LIB_PATH = _lib_dir() / "libsubgnn_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", "-pthread", str(_SRC), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() or (_SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime):
        if not _build():
            if not _LIB_PATH.exists():
                return None
            # the rebuild failed (no g++ / timeout) but a previously built
            # library exists: a possibly-stale fast kernel beats silently
            # dropping to the pure-NumPy BFS at 57k-node scale
            import warnings
            warnings.warn("subgnn_native rebuild failed; loading the "
                          "existing (possibly stale) libsubgnn_native.so")
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    try:
        _bind(lib)
    except AttributeError:
        # a stale library from an older package version lacks a newer
        # symbol: degrade to the NumPy paths instead of crashing
        # is_available()'s no-throw contract
        import warnings
        warnings.warn("libsubgnn_native.so is missing symbols (stale "
                      "build?); native kernels disabled")
        return None
    _lib = lib
    return _lib


def _bind(lib):
    lib.bfs_all_pairs.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.bfs_from_sources.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.triangular_walks_full.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_double, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]


def is_available() -> bool:
    return get_lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def bfs_all_pairs(graph, n_threads: int = 0) -> np.ndarray:
    """(n, n) int32 all-pairs hop distances (unreached = 0) via C++ threads."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    n = graph.n_nodes
    indptr = np.ascontiguousarray(graph.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(graph.indices, dtype=np.int32)
    out = np.zeros((n, n), dtype=np.int32)
    lib.bfs_all_pairs(_ptr(indptr, ctypes.c_int64),
                      _ptr(indices, ctypes.c_int32),
                      ctypes.c_int64(n), _ptr(out, ctypes.c_int32),
                      ctypes.c_int32(n_threads))
    return out


def bfs_from_sources(graph, sources: np.ndarray,
                     n_threads: int = 0) -> np.ndarray:
    """(len(sources), n) int32 hop distances from each 1-based source
    (unreached = 0) via C++ threads — the EM-USER-scale N/P-sim path,
    which needs rows only for the subgraph nodes, not all n^2 pairs."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    n = graph.n_nodes
    indptr = np.ascontiguousarray(graph.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(graph.indices, dtype=np.int32)
    src = np.ascontiguousarray(sources, dtype=np.int32)
    out = np.zeros((len(src), n), dtype=np.int32)
    lib.bfs_from_sources(_ptr(indptr, ctypes.c_int64),
                         _ptr(indices, ctypes.c_int32),
                         ctypes.c_int64(n), _ptr(src, ctypes.c_int32),
                         ctypes.c_int64(len(src)),
                         _ptr(out, ctypes.c_int32), ctypes.c_int32(n_threads))
    return out


def triangular_walks_full(graph, n_walks: int, walk_len: int, rw_beta: float,
                          seed: int, n_threads: int = 0) -> np.ndarray:
    """(n_walks, walk_len) int32 triangular walks over the full graph."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    starts = np.ascontiguousarray(graph.node_ids(), dtype=np.int32)
    indptr = np.ascontiguousarray(graph.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(graph.indices, dtype=np.int32)
    out = np.zeros((n_walks, walk_len), dtype=np.int32)
    lib.triangular_walks_full(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(starts, ctypes.c_int32), ctypes.c_int64(len(starts)),
        ctypes.c_int64(n_walks), ctypes.c_int32(walk_len),
        ctypes.c_double(rw_beta), ctypes.c_uint64(seed),
        _ptr(out, ctypes.c_int32), ctypes.c_int32(n_threads))
    return out
