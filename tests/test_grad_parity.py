"""Full-model GRADIENT parity: d loss / d params of our jitted train-mode
forward vs torch autograd on a reference-structured torch reimplementation
(VERDICT r3 task 4).

Pins the backward semantics end-to-end in one shot — the custom_vjp
GatherPlan embedding path, the lax.scan bi-LSTM backward, batch-norm in
train mode (batch statistics), inverted-dropout scaling, and the masked
loss — against torch autograd, the reference's gradient engine
(reference: SubGNN/SubGNN.py:1163-1164 loss.backward via Lightning,
Adam at :1156-1161).

The torch oracle reuses the forward recomputation strategy of
tests/test_golden_parity.py but keeps every tensor differentiable.
The dropout variant replicates the forward's exact rng split sequence so
both sides drop the same units; if models/subgnn.py reorders its rng
splits this test fails loudly (it is a parity pin on that sequence too).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subgnn_tpu.config import HParams
from subgnn_tpu.models.subgnn import SubGNNModel
from subgnn_tpu.ops.embedding import make_gather_plan
from subgnn_tpu.train.plans import neigh_ids_for_batch
from tests.test_models import build_toy


# --------------------------------------------------------------- torch side

def _to_torch(torch, tree):
    """jnp pytree -> same-shaped dict/list tree of requires_grad leaves."""
    if isinstance(tree, dict):
        return {k: _to_torch(torch, v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_torch(torch, v) for v in tree]
    t = torch.tensor(np.asarray(tree), dtype=torch.float32)
    t.requires_grad_(True)
    return t


def _torch_mpn(torch, params, cc, anchor_emb, sims, valid, layout):
    """mpn_layer (models/mpn.py:46-111) in differentiable torch."""
    w = torch.where(valid, sims, torch.zeros(()))
    w_pos = params["linear_position"]["w"]
    b_pos = params["linear_position"]["b"]
    if layout == "shared":
        agg = torch.einsum("bca,ad->bcd", w, anchor_emb)
        prop_pre = w * (anchor_emb @ w_pos)[:, 0][None, None, :] + b_pos
    elif layout == "per_subgraph":
        agg = torch.einsum("bca,bad->bcd", w, anchor_emb)
        prop_pre = w * (anchor_emb @ w_pos)[..., 0][:, None, :] + b_pos
    else:  # full
        agg = torch.einsum("bca,bcad->bcd", w, anchor_emb)
        prop_pre = w * (anchor_emb @ w_pos)[..., 0] + b_pos
    x = torch.cat([cc, agg], dim=-1)
    updated = torch.relu(x @ params["linear"]["w"] + params["linear"]["b"])
    return updated, torch.relu(prop_pre)


def _torch_bn_train(p, x):
    """_batch_norm train branch (models/subgnn.py:205-219): biased batch
    variance for normalization, over the flattened (B*C, D) view."""
    B, C, D = x.shape
    flat = x.reshape(B * C, D)
    mean = flat.mean(dim=0)
    var = flat.var(dim=0, unbiased=False)
    y = (flat - mean) / (var + 1e-5).sqrt() * p["scale"] + p["bias"]
    return y.reshape(B, C, D)


def _torch_lstm(torch, params, D, n_layers):
    """torch.nn.LSTM with our weights copied in, kept differentiable —
    after backward, .grad on the module params maps back transposed."""
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


def torch_loss(torch, model, tp, t_lstm, t_head_w, t_head_b, batch, anchors,
               labels, loss_valid, drop_masks):
    """Differentiable reference-structured recomputation of
    model.forward(train=True) + loss_fn."""
    hp = model.hp
    LT = torch.long

    row_mask = torch.ones(tp["node_embed"].shape[0], 1)
    row_mask[0] = 0.0
    table = tp["node_embed"] * row_mask  # pad row zero, zero grad to row 0

    cc_ids = torch.tensor(np.asarray(batch["cc_ids"]), dtype=LT)
    sub_idx = np.asarray(batch["subgraph_idx"])
    NP_sim = torch.tensor(np.asarray(batch["NP_sim"]))
    B, C, L = cc_ids.shape
    cc_mask = cc_ids[:, :, 0] != 0

    emb = table[cc_ids.reshape(-1)].reshape(B, C, L, -1)
    init_cc = emb.sum(dim=2) if hp.cc_aggregator == "sum" \
        else emb.max(dim=2).values

    def np_sims(ids):  # (B, C, A) long -> gathered NP_sim
        idx = (ids - 1).clamp(0, NP_sim.shape[2] - 1)
        return torch.gather(NP_sim, 2, idx)

    if hp.use_structure:
        iw = np.asarray(anchors["struc_int_walks"])
        bw = np.asarray(anchors["struc_bor_walks"])
        nl, A_S, W, Lw = iw.shape
        walks = torch.tensor(np.concatenate([iw, bw], 0), dtype=LT)
        wemb = table[walks.reshape(-1)].reshape(2 * nl * A_S * W, Lw, -1)
        out, _ = t_lstm(wemb)
        agg = out[:, -1, :] if hp.lstm_aggregator == "last" else out.sum(1)
        hidden = agg @ t_head_w + t_head_b
        semb = hidden.reshape(2 * nl, A_S, W, -1).sum(dim=2)
        emb_int_all, emb_bor_all = semb[:nl], semb[nl:]

    if hp.use_neighborhood:
        A_n_in = hp.n_anchor_patches_N_in
        n_ids_all = torch.tensor(
            np.asarray(neigh_ids_for_batch(anchors, sub_idx)), dtype=LT)
        nl_, _, _, A_tot = n_ids_all.shape
        n_emb_all = table[n_ids_all.reshape(-1)].reshape(
            nl_, B, C, A_tot, -1)

    N_in = N_out = P_in = P_out = S_in = S_out = init_cc
    outputs = []
    for l in range(hp.n_layers):
        if hp.use_neighborhood:
            lp = tp["channels"]["neighborhood"][l]
            ids = n_ids_all[l]
            sims = np_sims(ids)
            N_in, _ = _torch_mpn(torch, lp["internal"], N_in,
                                 n_emb_all[l, :, :, :A_n_in],
                                 sims[:, :, :A_n_in],
                                 ids[:, :, :A_n_in] != 0, "full")
            N_out, _ = _torch_mpn(torch, lp["border"], N_out,
                                  n_emb_all[l, :, :, A_n_in:],
                                  sims[:, :, A_n_in:],
                                  ids[:, :, A_n_in:] != 0, "full")
            if hp.batch_norm:
                N_in = _torch_bn_train(lp["bn_in"], N_in)
                N_out = _torch_bn_train(lp["bn_out"], N_out)
            outputs += [N_in, N_out]
        if hp.use_position:
            lp = tp["channels"]["position"][l]
            ids_in = torch.tensor(
                np.asarray(anchors["pos_int"][l])[sub_idx], dtype=LT)
            a_in_bc = ids_in[:, None, :].expand(B, C, ids_in.shape[1])
            valid_in = cc_mask[:, :, None].expand_as(a_in_bc)
            P_in, p1 = _torch_mpn(
                torch, lp["internal"], P_in,
                table[ids_in.reshape(-1)].reshape(B, ids_in.shape[1], -1),
                np_sims(a_in_bc), valid_in, "per_subgraph")
            ids_out = np.asarray(anchors["pos_ext"][l])
            sims_out = NP_sim[:, :, torch.tensor(ids_out - 1, dtype=LT)]
            valid_out = cc_mask[:, :, None].expand(B, C, len(ids_out))
            P_out, p2 = _torch_mpn(
                torch, lp["border"], P_out,
                table[torch.tensor(ids_out, dtype=LT)],
                sims_out, valid_out, "shared")
            outputs += [p1, p2]
        if hp.use_structure:
            lp = tp["channels"]["structure"][l]
            pool = torch.tensor(np.asarray(anchors["struc_pool_idx"][l]),
                                dtype=LT)
            valid = cc_mask[:, :, None].expand(B, C, pool.shape[0])
            I_S = torch.tensor(np.asarray(batch["I_S_sim"]))[:, :, pool]
            B_S = torch.tensor(np.asarray(batch["B_S_sim"]))[:, :, pool]
            S_in, s1 = _torch_mpn(torch, lp["internal"], S_in,
                                  emb_int_all[l], I_S, valid, "shared")
            S_out, s2 = _torch_mpn(torch, lp["border"], S_out,
                                   emb_bor_all[l], B_S, valid, "shared")
            outputs += [s1, s2]

    all_cc = torch.cat([init_cc] + outputs, dim=-1)
    sg = (all_cc * cc_mask[:, :, None]).sum(dim=1)

    h = tp["head"]
    x = torch.relu(sg @ h["lin1"]["w"] + h["lin1"]["b"])
    if drop_masks is not None:
        x = torch.tensor(drop_masks[0]) * x / (1.0 - hp.lin_dropout)
    x = torch.relu(x @ h["lin2"]["w"] + h["lin2"]["b"])
    if drop_masks is not None:
        x = torch.tensor(drop_masks[1]) * x / (1.0 - hp.lin_dropout)
    logits = x @ h["lin3"]["w"] + h["lin3"]["b"]

    logp = torch.log_softmax(logits, dim=-1)
    per = -logp[torch.arange(len(labels)), torch.tensor(labels, dtype=LT)]
    if loss_valid is None:
        return per.mean()
    w = torch.tensor(loss_valid, dtype=torch.float32)
    return (per * w).sum() / w.sum().clamp(min=1.0)


# ---------------------------------------------------------------- the test

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}[{i}]"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _replay_dropout_masks(hp, rng_key, shapes):
    """Replicate models/subgnn.py's rng split sequence for the two head
    dropout masks (forward:277-281 structure split, :400-408 head)."""
    rng = rng_key
    if hp.use_structure:
        rng, _ = jax.random.split(rng)
    masks = []
    for shape in shapes:
        rng, sub = jax.random.split(rng)
        masks.append(np.asarray(
            jax.random.bernoulli(sub, 1.0 - hp.lin_dropout, shape),
            np.float32))
    return masks


@pytest.mark.parametrize("batch_norm,lstm_n_layers,lin_dropout,use_plans",
                         [(True, 1, 0.0, True),
                          (False, 2, 0.3, False)])
def test_full_model_grad_matches_torch(rng, batch_norm, lstm_n_layers,
                                       lin_dropout, use_plans):
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    hp = HParams(n_layers=2, node_embed_size=8, n_anchor_patches_N_in=3,
                 n_anchor_patches_N_out=4, n_anchor_patches_pos_in=3,
                 n_anchor_patches_pos_out=5, n_anchor_patches_structure=4,
                 n_triangular_walks=2, random_walk_len=5,
                 linear_hidden_dim_1=16, linear_hidden_dim_2=8,
                 batch_norm=batch_norm, lstm_n_layers=lstm_n_layers,
                 lin_dropout=lin_dropout)
    model, params, state, batch, anchors, cc_ids = build_toy(hp, rng)
    n_sub = cc_ids.shape[0]
    labels = rng.integers(0, 3, n_sub).astype(np.int32)
    loss_valid = np.ones(n_sub, np.float32)
    loss_valid[-1] = 0.0  # pin masked-loss gradient semantics too

    if use_plans:
        # route node_embed grads through the custom_vjp GatherPlan path
        n_rows = params["node_embed"].shape[0]
        batch = dict(batch)
        batch["cc_plan"] = make_gather_plan(cc_ids, n_rows)
        batch["neigh_plan"] = make_gather_plan(
            neigh_ids_for_batch(anchors, np.asarray(batch["subgraph_idx"])),
            n_rows)

    key = jax.random.PRNGKey(7)

    @jax.jit
    def loss_jax(p):
        logits, _ = model.forward(p, state, batch, anchors, train=True,
                                  rng=key)
        return model.loss_fn(logits, jnp.asarray(labels),
                             valid=jnp.asarray(loss_valid))

    loss_val = loss_jax(params)
    grads = jax.grad(loss_jax)(params)

    drop_masks = None
    if lin_dropout > 0:
        drop_masks = _replay_dropout_masks(
            hp, key, [(n_sub, hp.linear_hidden_dim_1),
                      (n_sub, hp.linear_hidden_dim_2)])

    tp = _to_torch(torch, {k: v for k, v in params.items() if k != "lstm"})
    t_lstm = _torch_lstm(torch, params["lstm"], hp.node_embed_size,
                         lstm_n_layers)
    t_head_w = torch.tensor(np.asarray(params["lstm"]["head"]["w"]),
                            requires_grad=True)
    t_head_b = torch.tensor(np.asarray(params["lstm"]["head"]["b"]),
                            requires_grad=True)
    t_loss = torch_loss(torch, model, tp, t_lstm, t_head_w, t_head_b,
                        batch, anchors, labels, loss_valid, drop_masks)
    t_loss.backward()

    np.testing.assert_allclose(float(loss_val), float(t_loss.detach()),
                               rtol=1e-5, atol=1e-6)

    got = _flatten({k: v for k, v in grads.items() if k != "lstm"})
    want = _flatten(jax.tree_util.tree_map(
        lambda t: t.grad.numpy() if t.grad is not None else np.zeros(t.shape),
        tp, is_leaf=lambda x: hasattr(x, "grad")))
    assert set(got) == set(want)
    for name in sorted(got):
        np.testing.assert_allclose(
            got[name], want[name], atol=3e-5, rtol=2e-4,
            err_msg=f"grad mismatch at {name}")

    # LSTM grads live on the torch module (transposed layout)
    for l in range(lstm_n_layers):
        for di, dname in enumerate(("fwd", "bwd")):
            sfx = "_reverse" if di else ""
            ours = grads["lstm"]["layers"][l][dname]
            for jk, tk, transpose in (("w_ih", "weight_ih", True),
                                      ("w_hh", "weight_hh", True),
                                      ("b_ih", "bias_ih", False),
                                      ("b_hh", "bias_hh", False)):
                tg = getattr(t_lstm, f"{tk}_l{l}{sfx}").grad.numpy()
                np.testing.assert_allclose(
                    np.asarray(ours[jk]), tg.T if transpose else tg,
                    atol=3e-5, rtol=2e-4,
                    err_msg=f"lstm grad mismatch {dname}{l} {jk}")
    np.testing.assert_allclose(np.asarray(grads["lstm"]["head"]["w"]),
                               t_head_w.grad.numpy(), atol=3e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(grads["lstm"]["head"]["b"]),
                               t_head_b.grad.numpy(), atol=3e-5, rtol=2e-4)
