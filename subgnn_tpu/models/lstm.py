"""Bidirectional multi-layer LSTM with a linear head, via lax.scan.

Encodes structure-channel anchor-patch random walks
(reference: SubGNN/SubGNN.py:60-88 wraps cuDNN nn.LSTM; walk lengths are
10-26 so a fused scan over time with a large batch of walks keeps the MXU
busy — each scan step is a (batch, in) x (in, 4h) matmul).

Semantics match torch.nn.LSTM:
  * gate order i, f, g, o; c' = f*c + i*g; h' = o*tanh(c'),
  * bidirectional: per-timestep output is [h_fwd_t ; h_bwd_t] where the
    backward direction scans from the end,
  * stacked layers consume the 2h concatenated outputs of the layer below,
    with dropout between layers only (applied in train mode),
  * weight init U(-1/sqrt(h), 1/sqrt(h)).
Aggregator 'last' takes timestep -1 (even if it is padding — the reference
runs the LSTM over zero-padded walks without masking, quirk preserved);
'sum' sums over time. A final Linear(2h -> n_features) projects back.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def init_lstm_params(key, n_features: int, h: int, num_layers: int = 1):
    """Parameter pytree for the bi-LSTM + linear head."""
    bound = 1.0 / jnp.sqrt(h)
    layers = []
    for l in range(num_layers):
        in_dim = n_features if l == 0 else 2 * h
        dirs = []
        for _ in range(2):  # forward, backward
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            dirs.append({
                "w_ih": _uniform(k1, (in_dim, 4 * h), bound),
                "w_hh": _uniform(k2, (h, 4 * h), bound),
                "b_ih": _uniform(k3, (4 * h,), bound),
                "b_hh": _uniform(k4, (4 * h,), bound),
            })
        layers.append({"fwd": dirs[0], "bwd": dirs[1]})
    key, k1, k2 = jax.random.split(key, 3)
    head_bound = 1.0 / jnp.sqrt(2 * h)
    return {
        "layers": layers,
        "head": {"w": _uniform(k1, (2 * h, n_features), head_bound),
                 "b": _uniform(k2, (n_features,), head_bound)},
    }


_UNROLL = True  # walk lengths are 10-26: fully unroll the time loop
                # (removes per-iteration while-loop overhead on TPU and
                # lets XLA software-pipeline the small recurrent matmuls)


def _gates(xt, h, w_hh):
    gates = xt + h @ w_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    return i, f, jnp.tanh(g), o


def _precompute_xw(p, x):
    dt = x.dtype
    return x @ p["w_ih"].astype(dt) + (p["b_ih"] + p["b_hh"]).astype(dt)


def _bidir_xw(fwd_p, bwd_p, x):
    """Stacked per-direction input projections: (2, T, B, h4) where entry 1
    is the REVERSED sequence, so one forward-time scan covers both
    directions (XLA runs separate while loops serially — merging halves
    the sequential chain count)."""
    xw_f = _precompute_xw(fwd_p, x)
    xw_b = _precompute_xw(bwd_p, jnp.flip(x, axis=1))
    xw = jnp.stack([xw_f, xw_b], axis=0)          # (2, B, T, 4h)
    return jnp.swapaxes(xw, 1, 2)                 # (2, T, B, 4h)


def _bidir_scan(fwd_p, bwd_p, x):
    """Both directions in ONE scan over (B, T, in) -> (B, T, 2h)."""
    B = x.shape[0]
    dt = x.dtype
    h_dim = fwd_p["w_hh"].shape[0]
    w_hh = jnp.stack([fwd_p["w_hh"], bwd_p["w_hh"]], axis=0).astype(dt)
    xw = jnp.swapaxes(_bidir_xw(fwd_p, bwd_p, x), 0, 1)  # (T, 2, B, 4h)

    def step(carry, xt):
        h, c = carry                                      # (2, B, h)
        gates = xt + jnp.einsum("dbh,dhk->dbk", h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c = f * c + i * jnp.tanh(g)
        h = o * jnp.tanh(c)
        return (h, c), h

    zero = jnp.zeros((2, B, h_dim), dt)
    _, hs = jax.lax.scan(step, (zero, zero), xw, unroll=_UNROLL)
    fwd = jnp.swapaxes(hs[:, 0], 0, 1)                    # (B, T, h)
    bwd = jnp.flip(jnp.swapaxes(hs[:, 1], 0, 1), axis=1)  # un-reverse time
    return jnp.concatenate([fwd, bwd], axis=-1)           # (B, T, 2h)


def _bidir_reduce_sum(fwd_p, bwd_p, x):
    """Both directions in one scan, carrying only sum_t h_t: (B, 2h)."""
    B = x.shape[0]
    dt = x.dtype
    h_dim = fwd_p["w_hh"].shape[0]
    w_hh = jnp.stack([fwd_p["w_hh"], bwd_p["w_hh"]], axis=0).astype(dt)
    xw = jnp.swapaxes(_bidir_xw(fwd_p, bwd_p, x), 0, 1)  # (T, 2, B, 4h)

    def step(carry, xt):
        h, c, acc = carry
        gates = xt + jnp.einsum("dbh,dhk->dbk", h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c = f * c + i * jnp.tanh(g)
        h = o * jnp.tanh(c)
        return (h, c, acc + h), None

    zero = jnp.zeros((2, B, h_dim), dt)
    (_, _, acc), _ = jax.lax.scan(step, (zero, zero, zero), xw,
                                  unroll=_UNROLL)
    return jnp.concatenate([acc[0], acc[1]], axis=-1)     # (B, 2h)


def _cell_reduce(p, x, reverse: bool, mode: str):
    """One direction, returning only the aggregate the caller needs:
    mode='final' -> h after the full pass (B, h); mode='sum' -> sum_t h_t.
    No per-step output stacking — the scan carries (h, c[, acc]) only."""
    B = x.shape[0]
    dt = x.dtype
    h_dim = p["w_hh"].shape[0]
    w_hh = p["w_hh"].astype(dt)
    xw = _precompute_xw(p, x)

    def step(carry, xt):
        h, c, acc = carry
        i, f, g, o = _gates(xt, h, w_hh)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c, acc + h if mode == "sum" else acc), None

    zero = jnp.zeros((B, h_dim), dt)
    (h, c, acc), _ = jax.lax.scan(step, (zero, zero, zero),
                                  jnp.swapaxes(xw, 0, 1), reverse=reverse,
                                  unroll=_UNROLL)
    return acc if mode == "sum" else h


def _cell_single_step(p, x_t):
    """One cell application from zero state on a single timestep (B, in).

    For aggregator='last', the BACKWARD direction's output at the last
    timestep has consumed exactly one input (x_{T-1} with h=c=0), so the
    whole reverse scan collapses to this single step.
    """
    dt = x_t.dtype
    xw = (x_t @ p["w_ih"].astype(dt) + (p["b_ih"] + p["b_hh"]).astype(dt))
    i, f, g, o = _gates(xw, jnp.zeros_like(xw[..., : p["w_hh"].shape[0]]),
                        p["w_hh"].astype(dt))
    c = i * g
    return o * jnp.tanh(c)


def lstm_forward(params, x, *, aggregator: str = "last",
                 dropout: float = 0.0, train: bool = False, rng=None):
    """x: (B, T, n_features) -> (B, n_features).

    Only the LAST layer's reduced quantity is materialized: with 'last' the
    forward direction runs an output-free scan and the backward direction is
    a single cell step (its hidden at timestep T-1 has seen one input);
    with 'sum' both directions accumulate in the scan carry. Inner stacked
    layers still produce full sequences (the next layer consumes them).
    Numerics identical to the full-output formulation (torch-parity tests).
    """
    out = x
    n_layers = len(params["layers"])
    for li, layer in enumerate(params["layers"][:-1]):
        out = _bidir_scan(layer["fwd"], layer["bwd"], out)  # (B, T, 2h)
        if train and dropout > 0.0 and li < n_layers - 1:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout), 0.0)

    last = params["layers"][-1]
    if aggregator == "last":
        fwd_h = _cell_reduce(last["fwd"], out, reverse=False, mode="final")
        bwd_h = _cell_single_step(last["bwd"], out[:, -1, :])
        agg = jnp.concatenate([fwd_h, bwd_h], axis=-1)
    elif aggregator == "sum":
        agg = _bidir_reduce_sum(last["fwd"], last["bwd"], out)
    else:
        raise NotImplementedError(aggregator)
    dt = agg.dtype
    return agg @ params["head"]["w"].astype(dt) + params["head"]["b"].astype(dt)
