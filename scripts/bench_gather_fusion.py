"""A/B: N-channel anchor aggregation as einsum (dot_general, materializes
the gathered (L,B,C,A,D) operand in HBM) vs explicit multiply-reduce (XLA
can fuse the row gather into the reduction, never materializing it).

Isolates the exact flagship N-channel pattern (bench.py shapes): one
gather of all layers' anchor ids, two segment aggregations per layer,
fwd+bwd through the table, Adam-free (plain grad accumulation carry).
Methodology identical to bench_stages.py (fori_loop, carried deps,
perturbed inputs, RTT floor, round-robin medians).

Usage: PYTHONPATH=/root/repo python scripts/bench_gather_fusion.py [-iters 30]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench_stages import make_timer, rtt_floor_timer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-iters", type=int, default=30)
    ap.add_argument("-rounds", type=int, default=9)
    ap.add_argument("-dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    L, B, C, Ai, Ao, D, R = 2, 512, 3, 15, 30, 128, 8200
    At = Ai + Ao
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, D)), dt)
    ids = jnp.asarray(rng.integers(0, R, (L, B, C, At)), jnp.int32)
    w = jnp.asarray(rng.random((L, B, C, At)), dt)

    def agg_einsum(table, w, i):
        g = table[ids]                                  # (L,B,C,At,D)
        out = 0.0
        for l in range(L):
            out = out + jnp.einsum("bca,bcad->bcd", w[l, :, :, :Ai],
                                   g[l, :, :, :Ai]).sum()
            out = out + jnp.einsum("bca,bcad->bcd", w[l, :, :, Ai:],
                                   g[l, :, :, Ai:]).sum()
        return out

    def agg_mulreduce(table, w, i):
        g = table[ids]
        out = 0.0
        for l in range(L):
            out = out + (w[l, :, :, :Ai, None] * g[l, :, :, :Ai, :]).sum(
                dtype=jnp.float32)
            out = out + (w[l, :, :, Ai:, None] * g[l, :, :, Ai:, :]).sum(
                dtype=jnp.float32)
        return out

    def body_for(fn):
        grad = jax.grad(lambda t, w, i: fn(t, w, i).astype(jnp.float32),
                        argnums=(0, 1))

        def body(carry, i):
            t, wacc = carry
            dt_, dw = grad(t, w + i * 1e-30, i)
            return (t - 1e-12 * dt_, wacc - 1e-12 * dw[0, 0, 0, 0])

        return body

    timers = {}
    for name, fn in (("einsum", agg_einsum), ("mulreduce", agg_mulreduce)):
        timers[name] = make_timer(body_for(fn), (table, jnp.zeros((), dt)),
                                  args.iters)
    floor = rtt_floor_timer(args.iters)

    results = {k: [] for k in timers}
    floors = []
    for _ in range(args.rounds):
        for k, t in timers.items():
            results[k].append(t())
        floors.append(floor())
    f = float(np.median(floors))
    out = {k + "_us": round((float(np.median(v)) - f) * 1e6, 1)
           for k, v in results.items()}
    out["rtt_floor_us"] = round(f * 1e6, 1)
    out["dtype"] = args.dtype
    print(json.dumps(out))


if __name__ == "__main__":
    main()
