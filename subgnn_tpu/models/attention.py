"""Masked softmax, dot-product and additive attention (ff_attn readout).

Reference: SubGNN/attention.py (AllenNLP-derived). Only used when the
ff_attn hyperparameter is true (never in shipped configs), but part of the
API surface.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TINY = 1e-13


def masked_softmax(vector, mask, axis: int = -1):
    """Softmax over the unmasked entries (reference: attention.py:22-56,
    memory_efficient=False branch)."""
    if mask is None:
        return jax.nn.softmax(vector, axis=axis)
    mask = mask.astype(vector.dtype)
    result = jax.nn.softmax(vector * mask, axis=axis)
    result = result * mask
    return result / (result.sum(axis=axis, keepdims=True) + TINY)


def init_additive_attention(key, vector_dim: int, matrix_dim: int):
    """W, U, V parameters with xavier-uniform init
    (reference: attention.py:124-134)."""
    k1, k2, k3 = jax.random.split(key, 3)

    def xavier(k, shape):
        bound = jnp.sqrt(6.0 / (shape[0] + shape[1]))
        return jax.random.uniform(k, shape, minval=-bound, maxval=bound)

    return {
        "w": xavier(k1, (vector_dim, vector_dim)),
        "u": xavier(k2, (matrix_dim, vector_dim)),
        "v": xavier(k3, (vector_dim, 1)),
    }


def additive_attention(params, vector, matrix, matrix_mask=None):
    """V.tanh(Wx + Uy) similarities -> masked softmax over rows.

    vector: (B, Dv); matrix: (B, R, Dm); returns (B, R) weights
    (reference: attention.py:102-139).
    """
    inter = (vector @ params["w"])[:, None, :] + matrix @ params["u"]
    sims = (jnp.tanh(inter) @ params["v"])[..., 0]
    return masked_softmax(sims, matrix_mask)


def dot_product_attention(vector, matrix, matrix_mask=None,
                          normalize: bool = True):
    """Dot-product similarities between a vector and matrix rows ->
    optionally masked-softmax-normalized weights.

    vector: (B, D); matrix: (B, R, D); returns (B, R)
    (reference: attention.py:93-100 DotProductAttention on the
    Attention base :60-91, incl. the normalize=False similarity mode).
    """
    sims = jnp.einsum("bd,brd->br", vector, matrix)
    if normalize:
        return masked_softmax(sims, matrix_mask)
    return sims


def weighted_sum(matrix, attention_weights):
    """(B, R, D), (B, R) -> (B, D) (reference: subgraph_utils.py:179-211)."""
    return jnp.einsum("br,brd->bd", attention_weights, matrix)


def masked_sum(vector, mask, axis: int):
    """Sum with masked entries zeroed (reference: subgraph_utils.py:213-237)."""
    return jnp.where(mask, vector, 0.0).sum(axis=axis)
