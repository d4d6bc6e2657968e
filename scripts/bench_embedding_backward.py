"""Microbenchmark: embedding-table backward — XLA scatter-add vs gather plan.

Times the full flagship training step (fwd+bwd+Adam, bench.py shapes) with
and without plan routing, plus the isolated table-grad computation both
ways. Run on the real TPU:

    PYTHONPATH=/root/repo python scripts/bench_embedding_backward.py

Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import time

import numpy as np


def timeit(fn, *args, iters=30):
    import jax

    out = fn(*args)            # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import optax
    import __graft_entry__ as ge
    from subgnn_tpu.train.plans import PlanBuilder, neigh_ids_for_batch

    B, C, n_nodes = 512, 3, 8192
    hp_overrides = dict(node_embed_size=128, n_layers=2,
                        n_anchor_patches_N_in=15, n_anchor_patches_N_out=30,
                        n_anchor_patches_pos_in=30, n_anchor_patches_pos_out=60,
                        n_anchor_patches_structure=15, n_triangular_walks=5,
                        random_walk_len=10, linear_hidden_dim_1=64,
                        linear_hidden_dim_2=32)
    model, hp, params, state, batch, anchors = ge._build_flagship(
        n_nodes=n_nodes, n_sub=B, C=C, L=16, n_pool=150,
        hp_overrides=hp_overrides)

    builder = PlanBuilder(params["node_embed"].shape[0])
    plans = {
        "cc_plan": builder.build("cc", np.asarray(batch["cc_ids"])),
        "neigh_plan": builder.build(
            "neigh", neigh_ids_for_batch(anchors, np.arange(B))),
    }

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(0)

    def make_step(use_plans):
        b = dict(batch)
        if use_plans:
            b.update(plans)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                logits, _ = model.forward(p, state, b, anchors, train=True,
                                          rng=rng)
                return model.loss_fn(logits, b["label"], b["valid"])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        # time through a fori_loop so tunnel RTT does not pollute
        @jax.jit
        def run(params, opt_state):
            def body(i, carry):
                p, o, _ = carry
                return step(p, o)

            return jax.lax.fori_loop(0, 20, body,
                                     (params, opt_state, jnp.float32(0)))

        return run

    for name, use in (("step_scatter", False), ("step_plan", True)):
        dt = timeit(make_step(use), params, opt_state, iters=5) / 20
        print(json.dumps({"metric": name, "value": round(dt * 1e6, 1),
                          "unit": "us/step"}), flush=True)

    # isolated table-grad: d(sum over gathered rows)/d table
    ids = jnp.asarray(neigh_ids_for_batch(anchors, np.arange(B)))
    table = params["node_embed"]
    g = jax.random.normal(jax.random.PRNGKey(1), ids.shape + (table.shape[1],))

    from subgnn_tpu.ops.embedding import embedding_gather

    @jax.jit
    def grad_scatter(t, g):
        return jax.vjp(lambda t: t[ids], t)[1](g)[0]

    @jax.jit
    def grad_plan(t, g):
        return jax.vjp(
            lambda t: embedding_gather(t, ids, plans["neigh_plan"]), t)[1](g)[0]

    for name, fn in (("tablegrad_scatter", grad_scatter),
                     ("tablegrad_plan", grad_plan)):
        dt = timeit(fn, table, g, iters=50)
        print(json.dumps({"metric": name, "value": round(dt * 1e6, 1),
                          "unit": "us", "n_ids": int(np.prod(ids.shape))}),
              flush=True)


if __name__ == "__main__":
    main()
