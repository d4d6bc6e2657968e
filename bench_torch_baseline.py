"""Reference-style torch (CPU) baseline for bench.py's vs_baseline anchor.

Implements the reference's training step structure — edge-list scatter-add
message passing (reference: SubGNN/subgraph_mpn.py:162-231), bi-LSTM walk
encoder in the hot loop, 3-layer head, Adam — in plain torch on the same
workload shapes as bench.py, and prints the measured edges/s. The reference
repo publishes no perf numbers (BASELINE.md), so this measurement anchors
the vs_baseline ratio.
"""
from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def main():
    torch.manual_seed(0)
    B, C, n_nodes, D = 128, 3, 8192, 128
    n_layers = 2
    A_N_in, A_N_out, A_P_in, A_P_out, A_S = 15, 30, 30, 60, 15
    W, L = 5, 10
    n_classes = 4

    embed = nn.Embedding(n_nodes + 1, D, padding_idx=0)
    lstm = nn.LSTM(D, D, batch_first=True, bidirectional=True)
    lstm_head = nn.Linear(2 * D, D)
    mpns = nn.ModuleList()
    per_layer_edges = A_N_in + A_N_out + A_P_in + A_P_out + 2 * A_S
    for _ in range(n_layers * 6):
        m = nn.ModuleDict({"linear": nn.Linear(2 * D, D),
                           "linear_position": nn.Linear(D, 1)})
        mpns.append(m)
    hid = D + n_layers * 2 * D + (A_P_in + A_P_out) * n_layers + 2 * A_S * n_layers
    head = nn.Sequential(nn.Linear(hid, 64), nn.ReLU(), nn.Linear(64, 32),
                         nn.ReLU(), nn.Linear(32, n_classes))
    params = (list(embed.parameters()) + list(lstm.parameters())
              + list(lstm_head.parameters()) + list(mpns.parameters())
              + list(head.parameters()))
    opt = torch.optim.Adam(params, lr=1e-3)

    rng = np.random.default_rng(0)
    cc_ids = torch.tensor(rng.integers(1, n_nodes + 1, (B, C, 16)))
    labels = torch.tensor(rng.integers(0, n_classes, B))
    anchor_sets = {}
    for name, A in (("N_in", A_N_in), ("N_out", A_N_out), ("P_in", A_P_in),
                    ("P_out", A_P_out)):
        anchor_sets[name] = [torch.tensor(rng.integers(1, n_nodes + 1, (B, C, A)))
                             for _ in range(n_layers)]
    walks = [torch.tensor(rng.integers(0, n_nodes + 1, (A_S, W, L)))
             for _ in range(2 * n_layers)]
    sims = {name: torch.rand(B, C, a[0].shape[-1])
            for name, a in anchor_sets.items()}
    s_sims = torch.rand(B, C, A_S)

    def scatter_mpn(mpn, cc_embeds, anchor_embeds, sim):
        # edge-list scatter-add like PyG 'add' aggregation
        Bc = B * C
        A = anchor_embeds.shape[2]
        src = (sim.reshape(Bc, A, 1) * anchor_embeds.reshape(Bc, A, D))
        msgs = src.reshape(Bc * A, D)
        tgt = torch.arange(Bc).repeat_interleave(A)
        agg = torch.zeros(Bc, D).index_add_(0, tgt, msgs)
        upd = F.relu(mpn["linear"](
            torch.cat([cc_embeds.reshape(Bc, D), agg], dim=1)))
        prop = F.relu(mpn["linear_position"](msgs)).reshape(Bc, A)
        return upd.reshape(B, C, D), prop.reshape(B, C, A)

    def step():
        opt.zero_grad()
        init_cc = embed(cc_ids).sum(dim=2)
        outs = []
        N_in = N_out = P_in = P_out = S_in = S_out = init_cc
        k = 0
        for l in range(n_layers):
            N_in, _ = scatter_mpn(mpns[k], N_in, embed(anchor_sets["N_in"][l]),
                                  sims["N_in"]); k += 1
            N_out, _ = scatter_mpn(mpns[k], N_out, embed(anchor_sets["N_out"][l]),
                                   sims["N_out"]); k += 1
            outs += [N_in, N_out]
            P_in, p1 = scatter_mpn(mpns[k], P_in, embed(anchor_sets["P_in"][l]),
                                   sims["P_in"]); k += 1
            P_out, p2 = scatter_mpn(mpns[k], P_out, embed(anchor_sets["P_out"][l]),
                                    sims["P_out"]); k += 1
            outs += [p1, p2]
            for w_idx, (cc, label) in enumerate(((S_in, "in"), (S_out, "out"))):
                wemb = embed(walks[2 * l + w_idx]).reshape(A_S * W, L, D)
                h, _ = lstm(wemb)
                s_embeds = lstm_head(h[:, -1]).reshape(A_S, W, D).sum(1)
                s_embeds = s_embeds[None, None].expand(B, C, A_S, D)
                upd, prop = scatter_mpn(mpns[k], cc, s_embeds, s_sims); k += 1
                if label == "in":
                    S_in = upd
                else:
                    S_out = upd
                outs.append(prop)
        allcc = torch.cat([init_cc] + outs, dim=-1)
        logits = head(allcc.sum(dim=1))
        loss = F.cross_entropy(logits, labels)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    edges_per_step = B * C * per_layer_edges * n_layers
    print(json.dumps({"torch_cpu_edges_per_s": edges_per_step * iters / dt,
                      "sec_per_step": dt / iters}))


if __name__ == "__main__":
    main()
