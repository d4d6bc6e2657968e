"""Subgraph-level message passing as dense masked einsums.

The reference implements this as a PyG MessagePassing with an explicit
bipartite edge list (reference: SubGNN/subgraph_mpn.py:21-241). Because
every connected component receives a message from a FIXED number of anchor
patches per channel, the edge structure is regular: the whole layer
collapses to

    msgs[b,c,a,:] = valid[b,c,a] * sim[b,c,a] * anchor_embed[b,c,a,:]
    agg[b,c,:]    = sum_a msgs[b,c,a,:]                (scatter-add -> sum)
    cc'[b,c,:]    = relu(Linear([cc ; agg]))           (update, :233-241)
    prop[b,c,a]   = relu(Linear_1(msgs[b,c,a,:]))      (:105-131)

No scatter, no edge list — pure MXU-friendly batched matmuls. Quirks kept:
  * masked (invalid-anchor) message slots are exact zeros, so prop at those
    slots is relu(bias) (the reference writes raw messages into a PAD-filled
    buffer then applies the linear to every row, subgraph_mpn.py:118-123);
  * the update linear+relu also runs on padded CC rows (discarded later by
    the masked readout), matching the reference's update over the full
    stacked matrix.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def init_mpn_params(key, embed_dim: int):
    """Linear(2D -> D) update + Linear(D -> 1) property head
    (reference: subgraph_mpn.py:33-34), torch-default init."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b1 = 1.0 / jnp.sqrt(2 * embed_dim)
    b2 = 1.0 / jnp.sqrt(embed_dim)
    return {
        "linear": {"w": _uniform(k1, (2 * embed_dim, embed_dim), b1),
                   "b": _uniform(k2, (embed_dim,), b1)},
        "linear_position": {"w": _uniform(k3, (embed_dim, 1), b2),
                            "b": _uniform(k4, (1,), b2)},
    }


def mpn_layer(params, cc_embeds, anchor_embeds, sims, anchor_valid, *,
              use_mpn_projection: bool = True,
              norm_pos_struc_embed: bool = False):
    """One anchor-patch -> CC message-passing layer.

    cc_embeds:     (B, C, D)
    anchor_embeds: (B, C, A, D)
    sims:          (B, C, A)   channel-specific similarity per (CC, anchor)
    anchor_valid:  (B, C, A)   bool; invalid slots contribute nothing

    Returns (updated_cc (B,C,D), prop (B,C,A)).
    """
    dt = anchor_embeds.dtype
    w = jnp.where(anchor_valid, sims, 0.0)[..., None].astype(dt)  # (B,C,A,1)
    msgs = w * anchor_embeds                                  # (B,C,A,D)
    agg = msgs.sum(axis=2)                                    # (B,C,D)

    if use_mpn_projection:
        x = jnp.concatenate([cc_embeds.astype(dt), agg], axis=-1)  # (B,C,2D)
        updated = jax.nn.relu(
            x @ params["linear"]["w"].astype(dt)
            + params["linear"]["b"].astype(dt))
    else:
        updated = agg

    prop = (msgs @ params["linear_position"]["w"].astype(dt)
            + params["linear_position"]["b"].astype(dt))[..., 0]  # (B,C,A)
    if norm_pos_struc_embed:
        norm = jnp.linalg.norm(prop, axis=-1, keepdims=True)
        prop = prop / jnp.maximum(norm, 1e-12)
    else:
        prop = jax.nn.relu(prop)
    return updated, prop
