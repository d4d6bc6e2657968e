"""Vendored pure-Python FastDTW (Salvador & Chan 2007) for parity tests.

The reference computes structure similarities with the `fastdtw` package at
its default radius=1 (reference: SubGNN/gamma.py:54-59). That package is not
installed in this environment, so this module reimplements the published
algorithm — recursive coarsening by pairwise averaging, projecting the
low-resolution warp path up one level, and running a window-constrained DTW
within `radius` of the projected path — so the deviation of our exact-DTW
kernel from the reference's approximation can be quantified by tests
(tests/test_precompute.py) and scripts/dtw_deviation_study.py.

This is an independent implementation from the paper's pseudocode, not a
copy of the fastdtw package.
"""
from __future__ import annotations


def _full_window(n, m):
    return [(i, j) for i in range(1, n + 1) for j in range(1, m + 1)]


def _dtw_windowed(x, y, window, dist):
    """DTW restricted to `window` (1-based cells, row-major sorted).

    Returns (distance, path) with path as 0-based (i, j) index pairs.
    """
    D = {(0, 0): (0.0, (0, 0))}
    for i, j in window:
        c = dist(x[i - 1], y[j - 1])
        best = None
        for prev in ((i - 1, j), (i, j - 1), (i - 1, j - 1)):
            if prev in D and (best is None or D[prev][0] < D[best][0]):
                best = prev
        if best is None:
            continue
        D[(i, j)] = (D[best][0] + c, best)
    cell = (len(x), len(y))
    total = D[cell][0]
    path = []
    while cell != (0, 0):
        path.append((cell[0] - 1, cell[1] - 1))
        cell = D[cell][1]
    path.reverse()
    return total, path


def _reduce_by_half(x):
    return [(x[i] + x[i + 1]) / 2.0
            for i in range(0, len(x) - (len(x) % 2), 2)]


def _expand_window(path, len_x, len_y, radius):
    """Project a coarse path up one resolution level and dilate by radius."""
    dilated = set()
    for i, j in path:
        for di in range(-radius, radius + 1):
            for dj in range(-radius, radius + 1):
                dilated.add((i + di, j + dj))
    cells = set()
    for i, j in dilated:
        for cell in ((2 * i, 2 * j), (2 * i, 2 * j + 1),
                     (2 * i + 1, 2 * j), (2 * i + 1, 2 * j + 1)):
            if 0 <= cell[0] < len_x and 0 <= cell[1] < len_y:
                cells.add(cell)
    return sorted((i + 1, j + 1) for i, j in cells)


def _fastdtw(x, y, radius, dist):
    if len(x) < radius + 2 or len(y) < radius + 2:
        return _dtw_windowed(x, y, _full_window(len(x), len(y)), dist)
    _, coarse_path = _fastdtw(_reduce_by_half(x), _reduce_by_half(y),
                              radius, dist)
    window = _expand_window(coarse_path, len(x), len(y), radius)
    return _dtw_windowed(x, y, window, dist)


def fastdtw(x, y, radius=1, dist=None):
    """Drop-in analog of fastdtw.fastdtw: returns (distance, path)."""
    x = [float(v) for v in x]
    y = [float(v) for v in y]
    if dist is None:
        dist = lambda a, b: abs(a - b)
    return _fastdtw(x, y, radius, dist)
