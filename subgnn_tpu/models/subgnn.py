"""The SubGNN model: three property channels x {internal, border} x layers.

A functional re-design of the reference LightningModule forward pass
(reference: SubGNN/SubGNN.py:90-312) as a pure params/arrays function that
jits whole. Per layer and channel the message passing is the dense masked
einsum of models/mpn.py; structure anchor patches are encoded by the
lax.scan bi-LSTM of models/lstm.py inside the forward pass (gradients flow
into the LSTM exactly as in the reference hot loop,
anchor_patch_samplers.py:381-394,413-433).

Output layout per layer (reference: SubGNN.py:260-291, order preserved):
  neighborhood -> [N_in_cc (D), N_out_cc (D)]
  position     -> [P_in_prop (A_P_in), P_out_prop (A_P_out)]
  structure    -> [S_in_prop (A_S), S_out_prop (A_S)]
concatenated after the initial CC embedding (D), masked-summed over CCs,
then a 3-layer MLP head (SubGNN.py:295-310).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HParams
from ..ops.embedding import embedding_gather
from .lstm import init_lstm_params, lstm_forward
from .mpn import (init_mpn_params, mpn_messages, mpn_update,
                  mpn_update_stacked)
from . import attention as attn

PAD_VALUE = 0

CHANNEL_CC_KEYS = ("N_I", "N_B", "S_I", "S_B", "P_I", "P_B")


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _linear_init(key, d_in, d_out):
    k1, k2 = jax.random.split(key)
    b = 1.0 / jnp.sqrt(d_in)
    return {"w": _uniform(k1, (d_in, d_out), b), "b": _uniform(k2, (d_out,), b)}


def _bn_init(dim):
    return {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)}


def _bn_state_init(dim):
    return {"mean": jnp.zeros(dim), "var": jnp.ones(dim)}


class SubGNNModel:
    """Static model definition; parameters live in explicit pytrees."""

    def __init__(self, hp: HParams, n_nodes: int, num_classes: int,
                 multilabel: bool):
        self.hp = hp
        self.n_nodes = n_nodes
        self.num_classes = num_classes
        self.multilabel = multilabel

    # ------------------------------------------------------------------ dims

    @property
    def hid_dim(self) -> int:
        """Readout width (reference: SubGNN.py:118-147)."""
        hp = self.hp
        d = hp.node_embed_size
        if hp.use_neighborhood:
            d += hp.n_layers * 2 * hp.node_embed_size
        if hp.use_position:
            d += (hp.n_anchor_patches_pos_in + hp.n_anchor_patches_pos_out) * hp.n_layers
        if hp.use_structure:
            d += 2 * hp.n_anchor_patches_structure * hp.n_layers
        return d

    # ------------------------------------------------------------------ init

    def init_params(self, key, pretrained_embeds: np.ndarray,
                    train_cc_init: Optional[Dict[str, np.ndarray]] = None):
        """Build the parameter pytree.

        pretrained_embeds: (n_nodes, D) WITHOUT the pad row; a zero row is
        prepended (reference: SubGNN.py:562-568).
        train_cc_init: when trainable_cc, initial per-channel train-split CC
        tables (reference: SubGNN.py:624-644).
        """
        hp = self.hp
        D = hp.node_embed_size
        assert pretrained_embeds.shape[1] == D
        if pretrained_embeds.shape[0] < self.n_nodes:
            # a short table would make jnp's clamped gathers silently map
            # every high node id onto the last row (the GatherPlan path
            # raises for the same ids — keep both paths loud)
            raise ValueError(
                f"pretrained embeddings have {pretrained_embeds.shape[0]} "
                f"rows < n_nodes={self.n_nodes}: stale/mismatched "
                "embedding file for this graph")
        # pad the row count to a multiple of 8 so the table's leading axis
        # can shard evenly over a 'node' mesh axis (and tiles cleanly);
        # rows beyond n_nodes are never indexed
        rows = pretrained_embeds.shape[0] + 1
        aligned = -(-rows // 8) * 8
        table = jnp.concatenate(
            [jnp.zeros((1, D)), jnp.asarray(pretrained_embeds, jnp.float32),
             jnp.zeros((aligned - rows, D))], axis=0)

        params: Dict[str, Any] = {"node_embed": table}
        state: Dict[str, Any] = {}

        channels = {}
        bn_state = {}
        for name, used in (("neighborhood", hp.use_neighborhood),
                           ("position", hp.use_position),
                           ("structure", hp.use_structure)):
            if not used:
                continue
            layers = []
            for l in range(hp.n_layers):
                key, k1, k2 = jax.random.split(key, 3)
                layer = {"internal": init_mpn_params(k1, D),
                         "border": init_mpn_params(k2, D)}
                if hp.batch_norm:
                    layer["bn_in"] = _bn_init(D)
                    layer["bn_out"] = _bn_init(D)
                    bn_state[f"{name}_{l}_in"] = _bn_state_init(D)
                    bn_state[f"{name}_{l}_out"] = _bn_state_init(D)
                layers.append(layer)
            channels[name] = layers
        params["channels"] = channels
        if hp.batch_norm:
            state["bn"] = bn_state

        key, k = jax.random.split(key)
        params["lstm"] = init_lstm_params(k, D, D, hp.lstm_n_layers)

        key, k1, k2, k3 = jax.random.split(key, 4)
        params["head"] = {
            "lin1": _linear_init(k1, self.hid_dim, hp.linear_hidden_dim_1),
            "lin2": _linear_init(k2, hp.linear_hidden_dim_1, hp.linear_hidden_dim_2),
            "lin3": _linear_init(k3, hp.linear_hidden_dim_2, self.num_classes),
        }

        if hp.ff_attn:
            key, k1, k2 = jax.random.split(key, 3)
            bound = jnp.sqrt(6.0 / (self.hid_dim + 1))
            params["attn_vector"] = _uniform(k1, (self.hid_dim,), bound)
            params["attn"] = attn.init_additive_attention(k2, self.hid_dim,
                                                          self.hid_dim)

        if hp.trainable_cc and train_cc_init is not None:
            params["train_cc"] = {k: jnp.asarray(v, jnp.float32)
                                  for k, v in train_cc_init.items()}
        return params, state

    # ------------------------------------------------------------- embedding

    @staticmethod
    def _table(params):
        # row 0 is the pad embedding and must stay zero even when the table
        # trains (torch padding_idx semantics, reference SubGNN.py:568)
        return params["node_embed"].at[0].set(0.0)

    def initialize_cc_embeddings(self, table, cc_ids, plan=None):
        """(B, C, L) ids -> (B, C, D) via sum or max INCLUDING pad zeros
        (reference: SubGNN.py:609-622 does not mask; 'max' therefore clips
        at 0 — quirk preserved). `plan` (ops/embedding.py GatherPlan built
        from exactly cc_ids) routes the trainable-table backward through
        the scatter-free path."""
        if plan is not None:
            embeds = embedding_gather(table, cc_ids, plan)  # (B, C, L, D)
        else:
            embeds = table[cc_ids]  # (B, C, L, D)
        if self.hp.cc_aggregator == "sum":
            return embeds.sum(axis=2)
        elif self.hp.cc_aggregator == "max":
            return embeds.max(axis=2)
        raise NotImplementedError(self.hp.cc_aggregator)

    def _struct_anchor_embeds(self, params, table, int_walks, bor_walks, *,
                              train, rng):
        """All structure anchor-patch embeddings in ONE batched LSTM call.

        int_walks/bor_walks: (n_layers, A_S, W, L) walk ids. The anchor
        embeddings depend only on parameters — not on layer inputs — so the
        reference's 2 x n_layers separate LSTM invocations per forward
        (anchor_patch_samplers.py:386,413-433) fuse into a single scan with
        batch = 2*n_layers*A_S*W, keeping the MXU busy. Returns
        (emb_int, emb_bor), each (n_layers, A_S, D): LSTM over each walk,
        summed over walks.
        """
        hp = self.hp
        nl, A_S, W, L = int_walks.shape
        walks = jnp.concatenate([int_walks, bor_walks], axis=0)  # (2nl,A,W,L)
        walk_embeds = table[walks.reshape(2 * nl * A_S * W, L)]
        hidden = lstm_forward(params["lstm"], walk_embeds,
                              aggregator=hp.lstm_aggregator,
                              dropout=hp.lstm_dropout, train=train, rng=rng)
        emb = hidden.reshape(2 * nl, A_S, W, -1).sum(axis=2)
        return emb[:nl], emb[nl:]

    def _batch_norm(self, p, s, x, *, train):
        """BN over the flattened (B*C, D) view incl. padded rows
        (reference: SubGNN.py:267-290). Returns (y, new_state)."""
        B, C, D = x.shape
        flat = x.reshape(B * C, D)
        if train:
            mean = flat.mean(axis=0)
            var = flat.var(axis=0)
            new_s = {"mean": 0.9 * s["mean"] + 0.1 * mean,
                     "var": 0.9 * s["var"] + 0.1 * var * (B * C) / max(B * C - 1, 1)}
        else:
            mean, var = s["mean"], s["var"]
            new_s = s
        y = (flat - mean) / jnp.sqrt(var + 1e-5) * p["scale"] + p["bias"]
        return y.reshape(B, C, D), new_s

    # --------------------------------------------------------------- forward

    def forward(self, params, state, batch: Dict[str, Any],
                anchors: Dict[str, Any], *, train: bool, rng,
                cc_tables: Optional[Dict[str, Any]] = None):
        """Compute logits for one batch.

        batch: cc_ids (B,C,L) int32; subgraph_idx (B,) int32;
               NP_sim (B,C,n_nodes); I_S_sim/B_S_sim (B,C,n_pool) as needed.
        anchors: layer-major anchor arrays for this split (see
                 sampling/anchors.py layouts).
        cc_tables: 6 per-channel (N_split, C, D) tables when trainable_cc
                   (params['train_cc'] for the train split, state tables for
                   val/test — reference: SubGNN.py:237-250,646-668).

        Returns (logits (B, num_classes), new_state).
        """
        hp = self.hp
        table = self._table(params)
        if hp.dtype == "bfloat16":
            # bf16 activations/matmuls (MXU native), fp32 master weights;
            # logits return to fp32 before the loss
            table = table.astype(jnp.bfloat16)
        cc_ids = batch["cc_ids"]
        sub_idx = batch["subgraph_idx"]
        B, C, _ = cc_ids.shape
        new_state = dict(state)
        bn_state = dict(state.get("bn", {}))

        init_cc = self.initialize_cc_embeddings(
            table, cc_ids, batch.get("cc_plan"))                  # (B, C, D)
        cc_mask = cc_ids[:, :, 0] != PAD_VALUE                    # (B, C)

        if hp.use_neighborhood:
            # all layers' N-channel anchor embeds in ONE gather so the
            # backward is a single scatter-free plan matmul when
            # batch['neigh_plan'] is supplied (see train/plans.py for the
            # matching host-side id layout)
            A_n_in = hp.n_anchor_patches_N_in
            n_ids_all = jnp.concatenate(
                [anchors["neigh_int"][:, sub_idx],
                 anchors["neigh_bor"][:, sub_idx]], axis=-1)  # (L,B,C,Ai+Ao)
            neigh_plan = batch.get("neigh_plan")
            if neigh_plan is not None:
                n_emb_all = embedding_gather(table, n_ids_all, neigh_plan)
            else:
                n_emb_all = table[n_ids_all]

        if hp.trainable_cc and cc_tables is not None:
            ch_cc = {k: cc_tables[k][sub_idx] for k in CHANNEL_CC_KEYS}
        else:
            ch_cc = {k: init_cc for k in CHANNEL_CC_KEYS}
        N_in, N_out = ch_cc["N_I"], ch_cc["N_B"]
        P_in, P_out = ch_cc["P_I"], ch_cc["P_B"]
        S_in, S_out = ch_cc["S_I"], ch_cc["S_B"]

        if hp.use_structure:
            if rng is not None:
                rng, r_lstm = jax.random.split(rng)
            else:
                r_lstm = None
            emb_int_all, emb_bor_all = self._struct_anchor_embeds(
                params, table, anchors["struc_int_walks"],
                anchors["struc_bor_walks"], train=train, rng=r_lstm)

        def np_sims_gather(anchor_ids):
            # sims[b,c,a] = NP_sim[b, c, anchor_id-1]; invalid slots are
            # masked downstream (reference: subgraph_mpn.py:91-94)
            idx = jnp.clip(anchor_ids - 1, 0, batch["NP_sim"].shape[2] - 1)
            return jnp.take_along_axis(batch["NP_sim"], idx, axis=2)

        # compact mode (train/sims.py): the batch carries pre-gathered
        # anchor-column similarities instead of the (B, C, n_nodes) tensor
        neigh_sims = batch.get("neigh_sims")      # (L, B, C, A_in+A_out)
        pos_in_sims = batch.get("pos_in_sims")    # (L, B, C, A_P_in)
        pos_out_sims = batch.get("pos_out_sims")  # (L, B, C, A_P_out)

        outputs = []
        # fused_channel_update: defer every channel's update linear and run
        # them as ONE stacked contraction per layer (mpn_update_stacked) —
        # identical math, K-fold fewer kernels on the fixed op-sequencing
        # path (PERF.md round-5 A/B). Requires the projection update; the
        # agg-passthrough mode has no matmul to batch.
        fuse = hp.fused_channel_update and hp.use_mpn_projection
        for l in range(hp.n_layers):
            pend_p, pend_cc, pend_agg = [], [], []

            def channel_update(p, cc, agg):
                # fused mode: queue and return a placeholder slot index
                if fuse:
                    pend_p.append(p)
                    pend_cc.append(cc)
                    pend_agg.append(agg)
                    return len(pend_p) - 1
                return mpn_update(p, cc, agg,
                                  use_mpn_projection=hp.use_mpn_projection)

            if hp.use_neighborhood:
                # N-channel readout slots precede P/S within the layer; in
                # fused mode their values resolve after the stacked update,
                # so remember where they go
                n_outputs_pos = len(outputs)
                layer_p = params["channels"]["neighborhood"][l]
                a_in = n_ids_all[l, :, :, :A_n_in]               # (B, C, A)
                a_out = n_ids_all[l, :, :, A_n_in:]
                n_sims = (neigh_sims[l] if neigh_sims is not None
                          else np_sims_gather(n_ids_all[l]))
                agg, _ = mpn_messages(
                    layer_p["internal"], n_emb_all[l, :, :, :A_n_in],
                    n_sims[:, :, :A_n_in], a_in != PAD_VALUE,
                    norm_pos_struc_embed=hp.norm_pos_struc_embed)
                N_in = channel_update(layer_p["internal"], N_in, agg)
                agg, _ = mpn_messages(
                    layer_p["border"], n_emb_all[l, :, :, A_n_in:],
                    n_sims[:, :, A_n_in:], a_out != PAD_VALUE,
                    norm_pos_struc_embed=hp.norm_pos_struc_embed)
                N_out = channel_update(layer_p["border"], N_out, agg)

            if hp.use_position:
                layer_p = params["channels"]["position"][l]
                # internal anchors are shared across each subgraph's CCs and
                # border anchors across the whole batch (reference:
                # anchor_patch_samplers.py:366-379) — use the shared-anchor
                # MPN layouts: embeddings gathered once, reductions as
                # matmuls, masking by cc_mask (== the reference's PAD-ing of
                # anchor ids at padded CCs).
                ids_in = anchors["pos_int"][l][sub_idx]            # (B, A_in)
                a_in_bc = jnp.broadcast_to(
                    ids_in[:, None, :], (B, C, hp.n_anchor_patches_pos_in))
                valid_in = jnp.broadcast_to(
                    cc_mask[:, :, None], (B, C, hp.n_anchor_patches_pos_in))
                agg, P_in_prop = mpn_messages(
                    layer_p["internal"], table[ids_in],
                    (pos_in_sims[l] if pos_in_sims is not None
                     else np_sims_gather(a_in_bc)), valid_in,
                    norm_pos_struc_embed=hp.norm_pos_struc_embed,
                    layout="per_subgraph")
                P_in = channel_update(layer_p["internal"], P_in, agg)
                ids_out = anchors["pos_ext"][l]                    # (A_out,)
                sims_out = (pos_out_sims[l] if pos_out_sims is not None
                            else batch["NP_sim"][:, :, ids_out - 1])  # (B,C,A)
                valid_out = jnp.broadcast_to(
                    cc_mask[:, :, None], (B, C, hp.n_anchor_patches_pos_out))
                agg, P_out_prop = mpn_messages(
                    layer_p["border"], table[ids_out],
                    sims_out, valid_out,
                    norm_pos_struc_embed=hp.norm_pos_struc_embed,
                    layout="shared")
                P_out = channel_update(layer_p["border"], P_out, agg)
                outputs.extend([P_in_prop, P_out_prop])

            if hp.use_structure:
                layer_p = params["channels"]["structure"][l]
                pool_idx = anchors["struc_pool_idx"][l]          # (A_S,)
                emb_int, emb_bor = emb_int_all[l], emb_bor_all[l]  # (A_S, D)
                valid = jnp.broadcast_to(cc_mask[:, :, None],
                                         (B, C, pool_idx.shape[0]))

                def s_sims(sim_matrix):
                    # sims[b,c,a] = sim_matrix[b, c, pool_idx[a]]
                    # (reference: subgraph_mpn.py:88,95-99)
                    return sim_matrix[:, :, pool_idx]

                agg, S_in_prop = mpn_messages(
                    layer_p["internal"], emb_int,
                    s_sims(batch["I_S_sim"]), valid,
                    norm_pos_struc_embed=hp.norm_pos_struc_embed,
                    layout="shared")
                S_in = channel_update(layer_p["internal"], S_in, agg)
                agg, S_out_prop = mpn_messages(
                    layer_p["border"], emb_bor,
                    s_sims(batch["B_S_sim"]), valid,
                    norm_pos_struc_embed=hp.norm_pos_struc_embed,
                    layout="shared")
                S_out = channel_update(layer_p["border"], S_out, agg)
                outputs.extend([S_in_prop, S_out_prop])

            if fuse:
                # resolve the queued slots with one stacked contraction
                upd = mpn_update_stacked(pend_p, pend_cc, pend_agg)
                if hp.use_neighborhood:
                    N_in, N_out = upd[N_in], upd[N_out]
                if hp.use_position:
                    P_in, P_out = upd[P_in], upd[P_out]
                if hp.use_structure:
                    S_in, S_out = upd[S_in], upd[S_out]

            if hp.use_neighborhood:
                layer_p = params["channels"]["neighborhood"][l]
                if hp.batch_norm:
                    N_in, bn_state[f"neighborhood_{l}_in"] = self._batch_norm(
                        layer_p["bn_in"], bn_state[f"neighborhood_{l}_in"],
                        N_in, train=train)
                    N_out, bn_state[f"neighborhood_{l}_out"] = self._batch_norm(
                        layer_p["bn_out"], bn_state[f"neighborhood_{l}_out"],
                        N_out, train=train)
                outputs[n_outputs_pos:n_outputs_pos] = [N_in, N_out]

        all_cc = jnp.concatenate([init_cc] + outputs, axis=-1)   # (B, C, hid)

        if hp.ff_attn:
            batched_attn = jnp.broadcast_to(params["attn_vector"][None, :],
                                            (B, self.hid_dim))
            weights = attn.additive_attention(params["attn"], batched_attn,
                                              all_cc, cc_mask)
            sg_embed = attn.weighted_sum(all_cc, weights)
        else:
            sg_embed = attn.masked_sum(all_cc, cc_mask[:, :, None], axis=1)

        # 3-layer head with optional dropout (reference: SubGNN.py:306-310)
        h = params["head"]
        dt = sg_embed.dtype
        x = jax.nn.relu(sg_embed @ h["lin1"]["w"].astype(dt)
                        + h["lin1"]["b"].astype(dt))
        if train and hp.lin_dropout > 0:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - hp.lin_dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - hp.lin_dropout), 0.0)
        x = jax.nn.relu(x @ h["lin2"]["w"].astype(dt) + h["lin2"]["b"].astype(dt))
        if train and hp.lin_dropout > 0:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - hp.lin_dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - hp.lin_dropout), 0.0)
        logits = (x @ h["lin3"]["w"].astype(dt)
                  + h["lin3"]["b"].astype(dt)).astype(jnp.float32)

        if hp.batch_norm:
            new_state["bn"] = bn_state
        return logits, new_state

    # ------------------------------------------------------------------ loss

    def loss_fn(self, logits, labels, valid=None):
        """BCE-with-logits (multilabel) or softmax CE
        (reference: SubGNN.py:169-172,337-342). `valid` masks padded rows of
        short eval batches."""
        if self.multilabel:
            lab = labels.astype(logits.dtype)
            per = jnp.maximum(logits, 0) - logits * lab + jnp.log1p(
                jnp.exp(-jnp.abs(logits)))
            per = per.mean(axis=-1)
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        if valid is None:
            return per.mean()
        w = valid.astype(per.dtype)
        return (per * w).sum() / jnp.maximum(w.sum(), 1.0)
