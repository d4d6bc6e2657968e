"""Explicit ring collectives for ICI A/B experiments.

GSPMD already inserts all-reduces for the sharded training step (the op
schedule is measured in scripts/collectives_report.py and PERF.md); this
module provides the EXPLICIT counterparts — a chunked ring all-reduce
(reduce-scatter + all-gather) and a ring all-gather built from
`lax.ppermute` inside `shard_map` — so the two can be A/B-timed on real
multi-chip hardware (scripts/bench_ring_collectives.py). The reference
has no distributed layer at all (reference: SubGNN/train_config.py:122
hard-codes gpus=1); this is green-field SURVEY §2.3 surface.

Why a hand ring at all: XLA's all-reduce is already ring-based on ICI,
but an explicit ring exposes the knobs XLA hides — chunk granularity
(overlap window), uni- vs bi-directional link use, and the option to
fuse per-chunk computation (e.g. Adam updates on reduced gradient
chunks) into the rotation. The fused-update experiment is exactly what
"Pallas ring-collective experiments once hardware exists" (CLAUDE.md)
needs as its baseline.

Numerics: the ring accumulates in ppermute rotation order, so float sums
can differ from `lax.psum` by normal reassociation rounding (tests pin
exact equality for integer-valued payloads and allclose for floats).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _ring_perm(n: int):
    return [(j, (j + 1) % n) for j in range(n)]


def ring_all_reduce(x: jax.Array, axis_name: str) -> jax.Array:
    """Sum `x` across `axis_name` with an explicit uni-directional ring.

    Call inside `shard_map`/`pmap` with `axis_name` bound. Equivalent to
    `lax.psum(x, axis_name)` up to float reassociation; moves the same
    2*(n-1)/n * bytes(x) per link as XLA's ring.
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        return x
    i = lax.axis_index(axis_name)
    flat = x.reshape(-1)
    pad = (-flat.size) % n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, flat.dtype)])
    chunks = flat.reshape(n, -1)
    perm = _ring_perm(n)

    # reduce-scatter: after n-1 rotations device i owns the fully reduced
    # chunk (i+1) mod n
    def rs_step(t, buf):
        buf = lax.ppermute(buf, axis_name, perm)
        return buf + jnp.take(chunks, (i - t - 1) % n, axis=0)

    buf = lax.fori_loop(0, n - 1, rs_step,
                        jnp.take(chunks, i, axis=0))

    # all-gather the reduced chunks back around the ring
    out = jnp.zeros_like(chunks).at[(i + 1) % n].set(buf)

    def ag_step(t, carry):
        out, buf = carry
        buf = lax.ppermute(buf, axis_name, perm)
        return out.at[(i - t) % n].set(buf), buf

    out, _ = lax.fori_loop(0, n - 1, ag_step, (out, buf))
    flat_out = out.reshape(-1)
    if pad:
        flat_out = flat_out[:-pad]
    return flat_out.reshape(x.shape)


def ring_all_gather(x: jax.Array, axis_name: str) -> jax.Array:
    """Concatenate every device's `x` along a new leading axis via a
    uni-directional ring — the explicit form of `lax.all_gather`, the
    collective behind the node-sharded anchor-patch gather (PERF.md's
    "anchor-patch all-gather" accounting)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return x[None]
    i = lax.axis_index(axis_name)
    perm = _ring_perm(n)
    out = jnp.zeros((n,) + x.shape, x.dtype).at[i].set(x)

    def step(t, carry):
        out, buf = carry
        buf = lax.ppermute(buf, axis_name, perm)
        return out.at[(i - t - 1) % n].set(buf), buf

    out, _ = lax.fori_loop(0, n - 1, step, (out, x))
    return out


def ring_all_reduce_fused(x: jax.Array, axis_name: str, chunk_fn) -> jax.Array:
    """Ring all-reduce that applies `chunk_fn(reduced_chunk)` to each
    fully reduced chunk BEFORE rotating it back out — the
    fused-optimizer-update pattern (each device transforms the 1/n of
    the gradient it reduces, e.g. the Adam step, and the all-gather
    phase distributes already-updated chunks). `chunk_fn` must be
    elementwise/shape-preserving."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return chunk_fn(x)
    i = lax.axis_index(axis_name)
    flat = x.reshape(-1)
    pad = (-flat.size) % n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, flat.dtype)])
    chunks = flat.reshape(n, -1)
    perm = _ring_perm(n)

    def rs_step(t, buf):
        buf = lax.ppermute(buf, axis_name, perm)
        return buf + jnp.take(chunks, (i - t - 1) % n, axis=0)

    buf = chunk_fn(lax.fori_loop(0, n - 1, rs_step,
                                 jnp.take(chunks, i, axis=0)))
    out = jnp.zeros_like(chunks).at[(i + 1) % n].set(buf)

    def ag_step(t, carry):
        out, buf = carry
        buf = lax.ppermute(buf, axis_name, perm)
        return out.at[(i - t) % n].set(buf), buf

    out, _ = lax.fori_loop(0, n - 1, ag_step, (out, buf))
    flat_out = out.reshape(-1)
    if pad:
        flat_out = flat_out[:-pad]
    return flat_out.reshape(x.shape)
