"""Batch-size knee study + TPU-compiler bytes/step (VERDICT r3 tasks 5+8).

For each B in the sweep, compiles the SAME flagship training step bench.py
measures (plans + compact sims + bf16), times the 50-step on-device loop
(median of 3 dispatches), and extracts the TPU compiler's cost model for
the compiled program via compiled.cost_analysis() — 'bytes accessed' is
the XLA:TPU accounting of HBM traffic, replacing PERF.md's XLA:CPU
lowering upper bound in the roofline arithmetic.

Emits one JSON line per B plus a KNEE summary. Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_knee.py
Each new B is a fresh compile (2-10 min over the axon tunnel) — run it in
a queue, not interactively.
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

# 1280/1536 probe the gap between the 1024 knee and the 2048
# VMEM-spill cliff (round 5)
BATCHES = [64, 128, 256, 512, 1024, 1280, 1536, 2048]
ITERS = 50


def measure(B: int):
    import jax
    import jax.numpy as jnp
    import optax
    import __graft_entry__ as ge
    from subgnn_tpu.train.plans import PlanBuilder, neigh_ids_for_batch
    from subgnn_tpu.train import sims as S

    C, n_nodes = 3, 8192
    hp_overrides = dict(node_embed_size=128, n_layers=2,
                        n_anchor_patches_N_in=15, n_anchor_patches_N_out=30,
                        n_anchor_patches_pos_in=30,
                        n_anchor_patches_pos_out=60,
                        n_anchor_patches_structure=15, n_triangular_walks=5,
                        random_walk_len=10, linear_hidden_dim_1=64,
                        linear_hidden_dim_2=32,
                        dtype=os.environ.get("BENCH_DTYPE", "bfloat16"))
    model, hp, params, state, batch, anchors = ge._build_flagship(
        n_nodes=n_nodes, n_sub=B, C=C, L=16, n_pool=150,
        hp_overrides=hp_overrides)

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

    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            logits, _ = model.forward(p, state, batch, anchors, train=True,
                                      rng=rng)
            return model.loss_fn(logits, batch["label"], batch["valid"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run_steps(params, opt_state, batch):
        def body(i, carry):
            p, o, _ = carry
            return train_step(p, o, batch, jax.random.fold_in(rng, i))

        return jax.lax.fori_loop(0, ITERS, body,
                                 (params, opt_state, jnp.float32(0)))

    t_c = time.time()
    lowered = run_steps.lower(params, opt_state, batch)
    compiled = lowered.compile()
    compile_s = time.time() - t_c

    cost = {}
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        for k in ("bytes accessed", "flops",
                  "bytes accessed output", "optimal_seconds"):
            if ca and k in ca:
                cost[k] = float(ca[k])
    except Exception as e:  # cost model availability differs per backend
        cost["error"] = repr(e)

    p, o, loss = compiled(params, opt_state, batch)
    jax.block_until_ready(loss)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        p, o, loss = compiled(p, o, batch)
        jax.block_until_ready(loss)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    edges_per_layer = (hp.n_anchor_patches_N_in + hp.n_anchor_patches_N_out
                       + hp.n_anchor_patches_pos_in
                       + hp.n_anchor_patches_pos_out
                       + 2 * hp.n_anchor_patches_structure)
    edges_per_step = B * C * edges_per_layer * hp.n_layers
    row = {
        "B": B,
        "edges_per_s": round(edges_per_step * ITERS / dt, 1),
        "us_per_step": round(dt / ITERS * 1e6, 1),
        "spread_us": [round(t / ITERS * 1e6, 1) for t in times],
        "bytes_per_step": (round(cost["bytes accessed"] / ITERS, 1)
                           if "bytes accessed" in cost else None),
        "flops_per_step": (round(cost["flops"] / ITERS, 1)
                           if "flops" in cost else None),
        "compile_s": round(compile_s, 1),
        "cost_analysis": cost,
        "dtype": hp.dtype,
    }
    print("ROW " + json.dumps(row), flush=True)
    return row


def main():
    rows = [measure(B) for B in BATCHES]
    best = max(rows, key=lambda r: r["edges_per_s"])
    # knee = smallest B within 5% of the best throughput
    knee = next(r for r in rows
                if r["edges_per_s"] >= 0.95 * best["edges_per_s"])
    print("KNEE " + json.dumps({
        "best_B": best["B"], "best_edges_per_s": best["edges_per_s"],
        "knee_B": knee["B"], "knee_edges_per_s": knee["edges_per_s"],
        "curve": {str(r["B"]): r["edges_per_s"] for r in rows},
        "bytes_per_step": {str(r["B"]): r["bytes_per_step"] for r in rows},
    }), flush=True)


if __name__ == "__main__":
    main()
