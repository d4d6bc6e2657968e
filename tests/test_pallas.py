"""Pallas kernels in interpret mode (CPU) vs the reference implementations."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subgnn_tpu.ops.dtw_pallas import dtw_distance_pallas
from subgnn_tpu.precompute.dtw import dtw_distance_batch, dtw_host


def test_dtw_pallas_matches_scan(rng):
    N, La, Lb = 16, 10, 7
    lens_a = rng.integers(0, La + 1, N)
    lens_b = rng.integers(1, Lb + 1, N)
    a = np.zeros((N, La), np.float32)
    b = np.zeros((N, Lb), np.float32)
    for i in range(N):
        a[i, :lens_a[i]] = np.sort(rng.integers(0, 10, lens_a[i]))
        b[i, :lens_b[i]] = np.sort(rng.integers(0, 10, lens_b[i]))
    got = np.asarray(dtw_distance_pallas(
        jnp.asarray(a), jnp.asarray(lens_a), jnp.asarray(b),
        jnp.asarray(lens_b), interpret=True))
    expect = np.asarray(dtw_distance_batch(
        jnp.asarray(a), jnp.asarray(lens_a), jnp.asarray(b),
        jnp.asarray(lens_b)))
    np.testing.assert_allclose(got, expect, atol=1e-4)
    for i in range(N):
        if lens_a[i] and lens_b[i]:
            oracle = dtw_host(a[i, :lens_a[i]], b[i, :lens_b[i]])
            assert abs(got[i] - oracle) < 1e-3
