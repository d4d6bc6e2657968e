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


def mpn_messages(params, anchor_embeds, sims, anchor_valid, *,
                 norm_pos_struc_embed: bool = False,
                 layout: str = "full"):
    """Message aggregation + property head of one MPN layer, WITHOUT the
    channel-update linear (split out so the model can batch the updates
    of all active channels into one stacked contraction — see mpn_layer
    for the layouts and math). Returns (agg (B,C,D), prop (B,C,A))."""
    dt = anchor_embeds.dtype
    w = jnp.where(anchor_valid, sims, 0.0).astype(dt)             # (B,C,A)
    w_pos = params["linear_position"]["w"].astype(dt)             # (D, 1)
    b_pos = params["linear_position"]["b"].astype(dt)

    if layout == "shared":
        agg = jnp.einsum("bca,ad->bcd", w, anchor_embeds)
        proj = (anchor_embeds @ w_pos)[:, 0]                      # (A,)
        prop_pre = w * proj[None, None, :] + b_pos
    elif layout == "per_subgraph":
        agg = jnp.einsum("bca,bad->bcd", w, anchor_embeds)
        proj = (anchor_embeds @ w_pos)[..., 0]                    # (B, A)
        prop_pre = w * proj[:, None, :] + b_pos
    elif layout == "full":
        # same factoring as the shared layouts: never materialize the
        # (B, C, A, D) message tensor — agg contracts on the MXU and the
        # property head uses (w*emb) @ W == w * (emb @ W)
        agg = jnp.einsum("bca,bcad->bcd", w, anchor_embeds)
        proj = (anchor_embeds @ w_pos)[..., 0]                    # (B,C,A)
        prop_pre = w * proj + b_pos
    else:
        raise ValueError(layout)

    if norm_pos_struc_embed:
        norm = jnp.linalg.norm(prop_pre, axis=-1, keepdims=True)
        prop = prop_pre / jnp.maximum(norm, 1e-12)
    else:
        prop = jax.nn.relu(prop_pre)
    return agg, prop


def mpn_update(params, cc_embeds, agg, *, use_mpn_projection: bool = True):
    """Channel-update half of one MPN layer:
    relu(Linear([cc ; agg])) (reference: subgraph_mpn.py:233-241)."""
    if not use_mpn_projection:
        return agg
    dt = agg.dtype
    x = jnp.concatenate([cc_embeds.astype(dt), agg], axis=-1)     # (B,C,2D)
    return jax.nn.relu(x @ params["linear"]["w"].astype(dt)
                       + params["linear"]["b"].astype(dt))


def mpn_update_stacked(param_list, cc_list, agg_list):
    """Batch K channel updates into ONE contraction: the K per-channel
    (B*C, 2D) @ (2D, D) update matmuls of a layer become a single
    (K, B, C, 2D) x (K, 2D, D) batched einsum — mathematically identical
    per slice (same contraction order), but one kernel instead of K.
    This targets the fixed op-sequencing cost of the step (PERF.md
    round-5 stacked-update A/B), not FLOPs."""
    dt = agg_list[0].dtype
    x = jnp.stack([jnp.concatenate([cc.astype(dt), agg], axis=-1)
                   for cc, agg in zip(cc_list, agg_list)])      # (K,B,C,2D)
    w = jnp.stack([p["linear"]["w"].astype(dt) for p in param_list])
    b = jnp.stack([p["linear"]["b"].astype(dt) for p in param_list])
    out = jax.nn.relu(jnp.einsum("kbci,kio->kbco", x, w)
                      + b[:, None, None, :])
    return [out[k] for k in range(len(param_list))]


def mpn_layer(params, cc_embeds, anchor_embeds, sims, anchor_valid, *,
              use_mpn_projection: bool = True,
              norm_pos_struc_embed: bool = False,
              layout: str = "full"):
    """One anchor-patch -> CC message-passing layer.

    cc_embeds:     (B, C, D)
    anchor_embeds: layout-dependent (see below)
    sims:          (B, C, A)   channel-specific similarity per (CC, anchor)
    anchor_valid:  (B, C, A)   bool; invalid slots contribute nothing

    layout — exploits anchor sharing so the reduction runs on the MXU and
    the backward pass produces DENSE anchor-embedding grads instead of a
    (B*C*A)-row scatter into the embedding table:
      'full'         anchor_embeds (B, C, A, D): distinct anchors per CC
                     (neighborhood channel),
      'per_subgraph' anchor_embeds (B, A, D): anchors shared across the CCs
                     of each subgraph (internal position channel,
                     reference anchor_patch_samplers.py:366-371),
      'shared'       anchor_embeds (A, D): one anchor set for the whole
                     batch (border position + structure channels,
                     reference :373,390).
    The math is identical across layouts:
        agg[b,c]  = sum_a w[b,c,a] * emb[.,a,:]
        prop[b,c,a] = relu(w[b,c,a] * (emb @ W_pos) + b_pos)
    where w = valid * sim, using (w*emb) @ W_pos == w * (emb @ W_pos).

    Returns (updated_cc (B,C,D), prop (B,C,A)).
    """
    agg, prop = mpn_messages(params, anchor_embeds, sims, anchor_valid,
                             norm_pos_struc_embed=norm_pos_struc_embed,
                             layout=layout)
    updated = mpn_update(params, cc_embeds, agg,
                         use_mpn_projection=use_mpn_projection)
    return updated, prop
