"""Pallas TPU kernel: batched exact DTW (anti-diagonal wavefront in VMEM).

Same math as precompute/dtw.py's lax.scan version (ratio cost
(max+1)/(min+1)-1, reference SubGNN/gamma.py:51-59), but the whole DP runs
inside one kernel invocation per pair-tile: both sequences and the two
rolling diagonals stay resident in VMEM, the wavefront loop is a single
fori_loop on the VPU with no per-step HLO traffic. Grid tiles the pair axis.

Selected only on TPU (precompute/dtw.py's platform allowlist); tests run
it on CPU by passing interpret=True explicitly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = 3.0e38  # float32 finite stand-in for +inf (inf arithmetic is
                  # safe but finite sentinels keep the VPU fast paths)


def _dtw_kernel(a_ref, b_ref, la_ref, lb_ref, out_ref, prev_ref, prev2_ref):
    TN, La = a_ref.shape
    Lb = b_ref.shape[1]
    a = a_ref[:]                       # (TN, La)
    b = b_ref[:]                       # (TN, Lb)
    la = la_ref[:, 0]                  # (TN,) int32
    lb = lb_ref[:, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (TN, La), dimension=1)
    target_k = (la + lb - 2)[:, None]  # (TN, 1)
    target_i = jnp.clip(la - 1, 0, La - 1)[:, None]

    prev_ref[:] = jnp.full((TN, La), NEG_BIG, jnp.float32)
    prev2_ref[:] = jnp.full((TN, La), NEG_BIG, jnp.float32)
    out_ref[:] = jnp.zeros((TN, 1), jnp.float32)

    def step(k, _):
        prev = prev_ref[:]
        prev2 = prev2_ref[:]
        j = k - rows                                     # (TN, La)
        valid = (j >= 0) & (j < Lb)
        jc = jnp.clip(j, 0, Lb - 1)
        bv = jnp.take_along_axis(b, jc, axis=1)
        mx = jnp.maximum(a, bv)
        mn = jnp.minimum(a, bv)
        c = jnp.where(valid, (mx + 1.0) / (mn + 1.0) - 1.0, NEG_BIG)

        left = jnp.concatenate(
            [jnp.full((TN, 1), NEG_BIG), prev[:, :-1]], axis=1)
        diag = jnp.concatenate(
            [jnp.full((TN, 1), NEG_BIG), prev2[:, :-1]], axis=1)
        best = jnp.minimum(jnp.minimum(prev, left), diag)
        best = jnp.where((k == 0) & (rows == 0), 0.0, best)
        cur = jnp.minimum(c + best, NEG_BIG)

        hit = (k == target_k)
        # Mosaic-friendly answer extraction: masked row reduction instead of
        # a gather (gather lowering requires index shape == value shape)
        val = jnp.sum(jnp.where(rows == target_i, cur, 0.0), axis=1,
                      keepdims=True)                      # (TN, 1)
        out_ref[:] = jnp.where(hit, val, out_ref[:])
        prev2_ref[:] = prev
        prev_ref[:] = cur
        return 0

    jax.lax.fori_loop(0, La + Lb - 1, step, 0)
    # empty sequences -> distance 0
    out_ref[:] = jnp.where((la == 0)[:, None] | (lb == 0)[:, None],
                           0.0, out_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def dtw_distance_pallas(a, la, b, lb, *, interpret: bool = False):
    """(N, La), (N,), (N, Lb), (N,) -> (N,) exact DTW distances.

    N must be a multiple of 8 (pad with zero-length rows — they return 0).
    Sequences are padded to a common length (Mosaic's gather lowering needs
    index/value shape agreement for the b-diagonal gather).
    """
    N = a.shape[0]
    L = max(a.shape[1], b.shape[1])
    a = jnp.pad(a, ((0, 0), (0, L - a.shape[1])))
    b = jnp.pad(b, ((0, 0), (0, L - b.shape[1])))
    La = Lb = L
    TN = 8
    assert N % TN == 0, N
    grid = (N // TN,)
    out = pl.pallas_call(
        _dtw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, La), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, Lb), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TN, La), jnp.float32),
            pltpu.VMEM((TN, La), jnp.float32),
        ],
        interpret=interpret,
    )(a.astype(jnp.float32), b.astype(jnp.float32),
      la.astype(jnp.int32)[:, None], lb.astype(jnp.int32)[:, None])
    return out[:, 0]
