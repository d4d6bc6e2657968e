"""Remat A/B at the spill-regime batch sizes (round 4 follow-up).

bench_knee.py measured a collapse at B=2048 (3.7x time for 2x work) and
an fp32 collapse already at B=1024 — the spill regime. jax.checkpoint on
the forward trades recompute FLOPs (we are ~2% FLOP-bound) for live-buffer
memory, which may defer the cliff and raise the achievable knee.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_remat.py
Emits one JSON line per (B, dtype, remat) cell.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ITERS = 50


def measure(B: int, dtype: str, remat: bool):
    import jax
    import jax.numpy as jnp
    import optax
    import __graft_entry__ as ge
    from subgnn_tpu.train.plans import PlanBuilder, neigh_ids_for_batch
    from subgnn_tpu.train import sims as S

    C, n_nodes = 3, 8192
    model, hp, params, state, batch, anchors = ge._build_flagship(
        n_nodes=n_nodes, n_sub=B, C=C, L=16, n_pool=150,
        hp_overrides=dict(node_embed_size=128, n_layers=2,
                          n_anchor_patches_N_in=15, n_anchor_patches_N_out=30,
                          n_anchor_patches_pos_in=30,
                          n_anchor_patches_pos_out=60,
                          n_anchor_patches_structure=15, n_triangular_walks=5,
                          random_walk_len=10, linear_hidden_dim_1=64,
                          linear_hidden_dim_2=32, dtype=dtype))
    builder = PlanBuilder(params["node_embed"].shape[0])
    batch["cc_plan"] = builder.build("cc", np.asarray(batch["cc_ids"]))
    batch["neigh_plan"] = builder.build(
        "neigh", neigh_ids_for_batch(anchors, np.arange(B)))
    comp = S.compact_sims_for_batch(np.asarray(batch["NP_sim"]), anchors,
                                    hp, np.arange(B))
    batch.update({k: jnp.asarray(v) for k, v in comp.items()})
    del batch["NP_sim"]

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(0)

    def fwd(p, b, r):
        logits, _ = model.forward(p, state, b, anchors, train=True, rng=r)
        return model.loss_fn(logits, b["label"], b["valid"])

    if remat:
        fwd = jax.checkpoint(fwd)

    def train_step(params, opt_state, batch, r):
        loss, grads = jax.value_and_grad(fwd)(params, batch, r)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run_steps(params, opt_state, batch):
        def body(i, carry):
            p, o, _ = carry
            return train_step(p, o, batch, jax.random.fold_in(rng, i))
        return jax.lax.fori_loop(0, ITERS, body,
                                 (params, opt_state, jnp.float32(0)))

    try:
        p, o, loss = run_steps(params, opt_state, batch)
        jax.block_until_ready(loss)
    except Exception as e:  # OOM etc. — report, keep sweeping
        print("ROW " + json.dumps({"B": B, "dtype": dtype, "remat": remat,
                                   "error": repr(e)[:200]}), flush=True)
        return
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        p, o, loss = run_steps(p, o, batch)
        jax.block_until_ready(loss)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    edges = B * C * 330  # 165 edges/layer-subgraph-CC x 2 layers
    print("ROW " + json.dumps({
        "B": B, "dtype": dtype, "remat": remat,
        "edges_per_s": round(edges * ITERS / dt, 1),
        "us_per_step": round(dt / ITERS * 1e6, 1)}), flush=True)


def main():
    for dtype, Bs in (("bfloat16", [1024, 2048]), ("float32", [512, 1024])):
        for B in Bs:
            for remat in (False, True):
                measure(B, dtype, remat)


if __name__ == "__main__":
    main()
