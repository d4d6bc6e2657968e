"""Full-forward golden parity: our jitted forward vs an independent oracle
built the way the REFERENCE computes (explicit edge-list scatter message
passing + torch bi-LSTM walk encoder + padded property buffers), with
identical weights and identical injected anchor patches.

This is the BASELINE.json 'allclose per-layer channel activations' check:
every channel (N/P/S x internal/border), every layer, the readout, and the
head must agree.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subgnn_tpu.config import HParams
from subgnn_tpu.models.subgnn import SubGNNModel
from tests.test_models import build_toy, mpn_oracle


def torch_lstm_from_params(torch, params, D, n_layers):
    t_lstm = torch.nn.LSTM(D, D, num_layers=n_layers, batch_first=True,
                           bidirectional=True)
    with torch.no_grad():
        for l in range(n_layers):
            for di, dname in enumerate(("fwd", "bwd")):
                p = params["layers"][l][dname]
                sfx = "_reverse" if di else ""
                getattr(t_lstm, f"weight_ih_l{l}{sfx}").copy_(
                    torch.tensor(np.asarray(p["w_ih"]).T))
                getattr(t_lstm, f"weight_hh_l{l}{sfx}").copy_(
                    torch.tensor(np.asarray(p["w_hh"]).T))
                getattr(t_lstm, f"bias_ih_l{l}{sfx}").copy_(
                    torch.tensor(np.asarray(p["b_ih"])))
                getattr(t_lstm, f"bias_hh_l{l}{sfx}").copy_(
                    torch.tensor(np.asarray(p["b_hh"])))
    return t_lstm


def oracle_forward(torch, model, params, batch, anchors):
    """Reference-structured recomputation in numpy + torch."""
    hp = model.hp
    p = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    table = p["node_embed"].copy()
    table[0] = 0.0
    cc_ids = np.asarray(batch["cc_ids"])
    B, C, L = cc_ids.shape
    NP_sim = np.asarray(batch["NP_sim"])
    I_S = np.asarray(batch["I_S_sim"])
    B_S = np.asarray(batch["B_S_sim"])
    cc_mask = cc_ids[:, :, 0] != 0

    if hp.cc_aggregator == "sum":
        init_cc = table[cc_ids].sum(axis=2)
    else:
        init_cc = table[cc_ids].max(axis=2)

    t_lstm = torch_lstm_from_params(torch, p["lstm"], hp.node_embed_size,
                                    hp.lstm_n_layers)
    w_head = p["lstm"]["head"]

    def lstm_encode(walks):  # (A_S, W, L) -> (A_S, D)
        A_S, W, Lw = walks.shape
        emb = table[walks.reshape(A_S * W, Lw)]
        with torch.no_grad():
            out, _ = t_lstm(torch.tensor(emb, dtype=torch.float32))
            if hp.lstm_aggregator == "last":
                agg = out[:, -1, :].numpy()
            else:
                agg = out.sum(dim=1).numpy()
        hidden = agg @ w_head["w"] + w_head["b"]
        return hidden.reshape(A_S, W, -1).sum(axis=1)

    def np_sims(ids):  # (B, C, A) -> (B, C, A)
        idx = np.clip(ids - 1, 0, NP_sim.shape[2] - 1)
        return np.take_along_axis(NP_sim, idx, axis=2)

    N_in = N_out = P_in = P_out = S_in = S_out = init_cc
    outputs = []
    for l in range(hp.n_layers):
        if hp.use_neighborhood:
            lp = p["channels"]["neighborhood"][l]
            a_in = np.asarray(anchors["neigh_int"][l])
            a_out = np.asarray(anchors["neigh_bor"][l])
            N_in, _ = mpn_oracle(lp["internal"], N_in, table[a_in],
                                 np_sims(a_in), a_in != 0)
            N_out, _ = mpn_oracle(lp["border"], N_out, table[a_out],
                                  np_sims(a_out), a_out != 0)
            outputs += [N_in, N_out]
        if hp.use_position:
            lp = p["channels"]["position"][l]
            ids_in = np.broadcast_to(
                np.asarray(anchors["pos_int"][l])[:, None, :],
                (B, C, hp.n_anchor_patches_pos_in)).copy()
            ids_in[~cc_mask] = 0
            ids_out = np.broadcast_to(
                np.asarray(anchors["pos_ext"][l])[None, None, :],
                (B, C, hp.n_anchor_patches_pos_out)).copy()
            ids_out[~cc_mask] = 0
            P_in, p1 = mpn_oracle(lp["internal"], P_in, table[ids_in],
                                  np_sims(ids_in), ids_in != 0)
            P_out, p2 = mpn_oracle(lp["border"], P_out, table[ids_out],
                                   np_sims(ids_out), ids_out != 0)
            outputs += [p1, p2]
        if hp.use_structure:
            lp = p["channels"]["structure"][l]
            pool_idx = np.asarray(anchors["struc_pool_idx"][l])
            emb_i = lstm_encode(np.asarray(anchors["struc_int_walks"][l]))
            emb_b = lstm_encode(np.asarray(anchors["struc_bor_walks"][l]))
            A_S = pool_idx.shape[0]
            full_i = np.broadcast_to(emb_i[None, None], (B, C, A_S,
                                                         emb_i.shape[1]))
            full_b = np.broadcast_to(emb_b[None, None], (B, C, A_S,
                                                         emb_b.shape[1]))
            valid = np.broadcast_to(cc_mask[:, :, None], (B, C, A_S))
            S_in, s1 = mpn_oracle(lp["internal"], S_in, full_i,
                                  I_S[:, :, pool_idx], valid)
            S_out, s2 = mpn_oracle(lp["border"], S_out, full_b,
                                   B_S[:, :, pool_idx], valid)
            outputs += [s1, s2]

    all_cc = np.concatenate([init_cc] + outputs, axis=-1)
    sg = np.where(cc_mask[:, :, None], all_cc, 0.0).sum(axis=1)
    h = p["head"]
    x = np.maximum(sg @ h["lin1"]["w"] + h["lin1"]["b"], 0)
    x = np.maximum(x @ h["lin2"]["w"] + h["lin2"]["b"], 0)
    return x @ h["lin3"]["w"] + h["lin3"]["b"]


@pytest.mark.parametrize("cc_aggregator,lstm_n_layers", [("sum", 1), ("max", 2)])
def test_full_forward_matches_reference_structured_oracle(
        rng, cc_aggregator, lstm_n_layers):
    torch = pytest.importorskip("torch")
    hp = HParams(n_layers=2, node_embed_size=8, n_anchor_patches_N_in=3,
                 n_anchor_patches_N_out=4, n_anchor_patches_pos_in=3,
                 n_anchor_patches_pos_out=5, n_anchor_patches_structure=4,
                 n_triangular_walks=2, random_walk_len=5,
                 linear_hidden_dim_1=16, linear_hidden_dim_2=8,
                 cc_aggregator=cc_aggregator, lstm_n_layers=lstm_n_layers)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    ours, _ = model.forward(params, state, batch, anchors, train=False,
                            rng=None)
    expect = oracle_forward(torch, model, params, batch, anchors)
    np.testing.assert_allclose(np.asarray(ours), expect, atol=2e-4,
                               rtol=1e-4)
