"""Speed-of-light check for the anchor-embedding gather: time a RAW XLA
row gather at the exact flagship shape (138,240 rows x 512 B from an
8200x128 fp32 table per step) with nothing else in the program, and
compare the model step's gather-stage cost against it.

If the raw gather achieves X GB/s, the model cannot beat bytes/X for
that stage — this is the gather unit's own ceiling, distinct from the
dense-stream HBM roofline (PERF.md).

Usage: PYTHONPATH=/root/repo python scripts/bench_gather_ceiling.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench_stages import make_timer, rtt_floor_timer  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    L, B, C, At, D, R = 2, 512, 3, 45, 128, 8200
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, R, (L, B, C, At)), jnp.int32)
    n_rows = L * B * C * At
    bytes_moved = n_rows * D * 4  # gather read (write side is the same size)

    def gather_body(carry, i):
        t, acc = carry
        # index depends on the loop CARRY so nothing can constant-fold or
        # hoist the gather (i-based arithmetic like `i - i` folds to 0)
        bump = (acc > jnp.float32(1e30)).astype(jnp.int32)
        g = t[jnp.minimum(ids + bump, R - 1)]
        return (t, acc + g.sum() * 1e-30 + 1.0)

    iters = 50
    g_t = make_timer(gather_body, (table, jnp.float32(0)), iters)
    floor = rtt_floor_timer(iters)
    gs, fs = [], []
    for _ in range(9):
        gs.append(g_t())
        fs.append(floor())
    g = float(np.median(gs)) - float(np.median(fs))
    print(json.dumps({
        "gather_us_per_iter": round(g * 1e6, 1),
        "rows_per_s": round(n_rows / g, 1),
        "achieved_GBps": round(bytes_moved / g / 1e9, 2),
        "note": "read side only; fp32 512B rows at the flagship shape",
    }))


if __name__ == "__main__":
    main()
