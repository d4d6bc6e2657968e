"""A/B: fused_channel_update (stacked per-layer channel-update matmuls)
vs the per-channel baseline — the VERDICT r4 task-4 measured attack on
the fixed ~900us/step op-sequencing cost (PERF.md round-4 roofline:
t(B) ~ 900us + ~2.8us*B at bf16; the fixed part is ~25% of the step at
the flagship B=1024).

Same-process A/B at the bench.py flagship shapes (D=128, 2 layers, all
channels, plans + compact sims). B=64 runs are fixed-cost-dominated, so
they expose the sequencing delta directly; B=1024 shows the flagship
impact. Also counts optimized-HLO instructions/fusions of the single
train step per variant (the sequencing cost is kernel count).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stacked_update.py
"""
from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build(B, fused, dtype="bfloat16"):
    import jax.numpy as jnp
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
                        linear_hidden_dim_2=32, dtype=dtype,
                        fused_channel_update=fused)
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
    return model, hp, params, state, batch, anchors


def measure(B, fused, iters=50, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    import optax

    model, hp, params, state, batch, anchors = build(B, fused, dtype)
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

    # HLO accounting of ONE step (kernel-sequencing proxy)
    compiled = jax.jit(train_step).lower(params, opt_state, batch,
                                         rng).compile()
    hlo = compiled.as_text()
    n_instr = len(re.findall(r"^\s+\S+ = ", hlo, flags=re.M))
    n_fusion = len(re.findall(r" = \S* ?fusion\(", hlo))
    n_dots = hlo.count("custom-call") + len(re.findall(r" dot\(", hlo))

    @jax.jit
    def run_steps(params, opt_state, batch):
        def body(i, carry):
            p, o, _ = carry
            return train_step(p, o, batch, jax.random.fold_in(rng, i))

        return jax.lax.fori_loop(0, iters, body,
                                 (params, opt_state, jnp.float32(0)))

    p, o, loss = run_steps(params, opt_state, batch)
    jax.block_until_ready(loss)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        p, o, loss = run_steps(p, o, batch)
        jax.block_until_ready(loss)
        times.append(time.perf_counter() - t0)
    us_per_step = float(np.median(times)) / iters * 1e6

    edges_per_layer = (hp.n_anchor_patches_N_in + hp.n_anchor_patches_N_out
                       + hp.n_anchor_patches_pos_in
                       + hp.n_anchor_patches_pos_out
                       + 2 * hp.n_anchor_patches_structure)
    edges_per_s = B * 3 * edges_per_layer * hp.n_layers / (us_per_step / 1e6)
    return {"B": B, "fused": fused, "us_per_step": round(us_per_step, 1),
            "edges_per_s": round(edges_per_s, 1),
            "spread_us": [round(t / iters * 1e6, 1) for t in times],
            "hlo_instructions": n_instr, "hlo_fusions": n_fusion,
            "hlo_dot_or_cc": n_dots}


def main():
    rows = []
    for B in (64, 1024):
        for fused in (False, True):
            r = measure(B, fused)
            rows.append(r)
            print("STACKED_AB " + json.dumps(r), flush=True)
    base = {r["B"]: r for r in rows if not r["fused"]}
    for r in rows:
        if r["fused"]:
            b = base[r["B"]]
            print(f"SUMMARY B={r['B']}: {b['us_per_step']} -> "
                  f"{r['us_per_step']} us/step "
                  f"({(b['us_per_step'] / r['us_per_step'] - 1) * 100:+.1f}% "
                  f"speed), instrs {b['hlo_instructions']} -> "
                  f"{r['hlo_instructions']}", flush=True)


if __name__ == "__main__":
    main()
