"""A/B: XLA's psum vs the explicit ring collectives on real multi-chip.

The first measurement to run when >=2 real TPU chips are reachable
(CLAUDE.md "Pallas ring-collective experiments"): times, per payload
size,
  (a) lax.psum               — GSPMD/XLA's native ICI all-reduce,
  (b) ring_all_reduce        — explicit ppermute ring (parallel/collectives.py),
  (c) ring_all_reduce_fused  — ring with the optimizer-style chunk
                               transform fused into the rotation,
each inside one on-device fori_loop dispatch (tunnel RTT stays out of
the number, same methodology as bench.py). Payloads bracket the
production step's collective volume (PERF.md: 17.6 MB/step gradient
all-reduce, 4.75 MB/step anchor gathers).

On a single-chip/virtual-CPU mesh the script still runs (correctness +
relative overhead only) and says so in the JSON — absolute CPU-mesh
times measure shared-memory emulation, not ICI.

Usage: PYTHONPATH=/root/repo python scripts/bench_ring_collectives.py \
           [-iters 50] [-cpu] [-devices N]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-iters", type=int, default=50)
    ap.add_argument("-cpu", action="store_true",
                    help="force a virtual CPU mesh (default when <2 real "
                         "devices)")
    ap.add_argument("-devices", type=int, default=8,
                    help="virtual device count for -cpu mode")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import Mesh, PartitionSpec as P
    from subgnn_tpu.parallel.collectives import (ring_all_reduce,
                                                 ring_all_reduce_fused)

    devs = jax.devices()
    if len(devs) < 2 and not args.cpu:
        print(json.dumps({"error": "single device — rerun with -cpu for "
                          "the emulated mesh, or on a pod for ICI numbers"}))
        return
    mesh = Mesh(np.asarray(devs), ("r",))
    n = len(devs)
    emulated = devs[0].platform == "cpu"

    # per-device payloads: the production gradient all-reduce is ~17.6 MB
    # total; sweep around it
    sizes_mb = [1, 4, 16]
    results = []
    for mb in sizes_mb:
        elems = mb * (1 << 20) // 4
        x = jnp.asarray(np.random.default_rng(0).normal(size=(n, elems)),
                        jnp.float32)

        def timed(fn_local, tag):
            f = jax.jit(jax.shard_map(fn_local, mesh=mesh,
                                      in_specs=P("r"), out_specs=P("r")))

            def loop(x):
                def body(i, acc):
                    return f(acc + 1e-30 * i)  # carry dep: no hoisting
                return lax.fori_loop(0, args.iters, body, x)

            lj = jax.jit(loop)
            jax.block_until_ready(lj(x))          # compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(lj(x))
                ts.append((time.perf_counter() - t0) / args.iters)
            return float(np.median(ts))

        def psum_local(xs):
            return lax.psum(xs, "r")

        def ring_local(xs):
            return ring_all_reduce(xs, "r")

        def fused_local(xs):
            # Adam-shaped elementwise transform on the reduced chunk
            return ring_all_reduce_fused(
                xs, "r", lambda c: c / (jnp.abs(c) + 1e-8))

        row = {"payload_mb_per_device": mb,
               "psum_s": timed(psum_local, "psum"),
               "ring_s": timed(ring_local, "ring"),
               "ring_fused_s": timed(fused_local, "ring_fused")}
        row["ring_vs_psum"] = round(row["psum_s"] / row["ring_s"], 3)
        results.append(row)

    print(json.dumps({
        "devices": n,
        "platform": devs[0].platform,
        "emulated_mesh": emulated,
        "note": ("CPU shared-memory emulation — relative overhead only, "
                 "not ICI bandwidth" if emulated else
                 "real ICI measurement"),
        "iters": args.iters,
        "results": results}))


if __name__ == "__main__":
    main()
