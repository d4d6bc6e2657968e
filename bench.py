"""Benchmark: SubGNN training-step throughput on the attached accelerator.

Prints ONE JSON line:
    {"metric": "mpn_edges_per_s", "value": N, "unit": "edges/s",
     "vs_baseline": R, "anchor_patch_samples_per_s": W}

The primary metric counts anchor-patch->CC message edges processed per
second by the full jitted training step (forward + backward + Adam) on the
flagship configuration — the reference's hot loop equivalent (its PyG
scatter over the same bipartite edges, SubGNN/subgraph_mpn.py:162-231).
vs_baseline is the ratio against BASELINE_EDGES_PER_S, an estimated
reference-implementation throughput for the same edge count (measured once
with the torch path; the reference repo itself publishes no perf numbers —
BASELINE.md). anchor_patch_samples_per_s is the on-device triangular-walk
sampler's anchor patches per second per chip (BASELINE.json's second
metric); per-stage attribution lives in scripts/bench_stages.py + PERF.md.
"""
from __future__ import annotations

import json
import time

import numpy as np

# Measured reference-style throughput: the scatter-based torch-CPU step in
# bench_torch_baseline.py (the reference repo publishes no perf numbers —
# BASELINE.md). Measured 2026-08-17 on this machine at B=128: 652.5k
# edges/s (0.194 s/step); CPU edges/s is roughly batch-size flat.
BASELINE_EDGES_PER_S = 6.525e5


def main():
    import jax
    import jax.numpy as jnp
    import optax
    import __graft_entry__ as ge

    # Watchdog: a wedged TPU tunnel hangs block_until_ready forever
    # (observed round 2); after 20 min with no completed measurement,
    # emit an explicit error JSON instead of hanging the caller. Normal
    # worst case is ~10 min of remote compile, so 20 min is conservative.
    import os as _os
    import threading as _threading
    _done = _threading.Event()

    def _watchdog():
        if not _done.wait(1200):
            print(json.dumps({
                "metric": "mpn_edges_per_s", "value": 0.0,
                "unit": "edges/s", "vs_baseline": 0.0,
                "anchor_patch_samples_per_s": 0.0,
                "error": "TPU unreachable: no dispatch completed in 20 min "
                         "(wedged tunnel); see RESULTS.md for the last "
                         "verified numbers"}), flush=True)
            _os._exit(3)

    _threading.Thread(target=_watchdog, daemon=True).start()

    # production-ish shapes: D=128, 2 layers, all three channels, flagship
    # B pinned at the measured knee (scripts/bench_knee.py round 5:
    # 64.5M@64 / 114M@128 / 169M@256 / 244M@512 / 273M@1024 / 294M@1280 /
    # 290M@1536 / collapse 150M@2048 — fixed ~900us/step op-sequencing
    # amortizes with B until the B=2048 spill regime; PERF.md knee section)
    import os
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # per-dtype knee: fp32 doubles bytes/step and hits the spill regime at
    # half the batch (measured: fp32 207M@512 > 164M@1024, while bf16
    # 294M@1280 > 273M@1024 > 244M@512 — bench_knee.py + queue6 A/B)
    B = 1280 if dtype == "bfloat16" else 512
    C, n_nodes = 3, 8192
    hp_overrides = dict(node_embed_size=128, n_layers=2,
                        n_anchor_patches_N_in=15, n_anchor_patches_N_out=30,
                        n_anchor_patches_pos_in=30, n_anchor_patches_pos_out=60,
                        n_anchor_patches_structure=15, n_triangular_walks=5,
                        random_walk_len=10, linear_hidden_dim_1=64,
                        linear_hidden_dim_2=32,
                        # Production default: bf16 activations with fp32
                        # master weights — end-metric parity measured on
                        # ALL FOUR synthetic tasks x 10 seeds at the
                        # headline frozen configs (bf16 >= fp32 on every
                        # task, RESULTS.md bf16 parity table, round 3).
                        # BENCH_DTYPE=float32 runs the fp32 A/B.
                        dtype=dtype)
    model, hp, params, state, batch, anchors = ge._build_flagship(
        n_nodes=n_nodes, n_sub=B, C=C, L=16, n_pool=150,
        hp_overrides=hp_overrides)

    # host-side gather plans: embedding-table backward as blocked MXU
    # matmuls instead of a scatter-add (subgnn_tpu/ops/embedding.py);
    # BENCH_NO_PLANS=1 reverts to the scatter path for A/B runs
    if not os.environ.get("BENCH_NO_PLANS"):
        from subgnn_tpu.train.plans import PlanBuilder, neigh_ids_for_batch
        builder = PlanBuilder(params["node_embed"].shape[0])
        idx = np.arange(B)
        batch["cc_plan"] = builder.build("cc", np.asarray(batch["cc_ids"]))
        batch["neigh_plan"] = builder.build(
            "neigh", neigh_ids_for_batch(anchors, idx))

    # compact anchor-column NP sims (train/sims.py): the production fused
    # trainer pre-gathers the sampled anchor COLUMNS host-side instead of
    # shipping the (B, C, n_nodes) tensor and take_along_axis-ing it per
    # step; bench measures that path. BENCH_NO_COMPACT=1 reverts for A/B.
    if not os.environ.get("BENCH_NO_COMPACT"):
        from subgnn_tpu.train import sims as S
        import jax.numpy as _jnp
        comp = S.compact_sims_for_batch(np.asarray(batch["NP_sim"]), anchors,
                                        hp, np.arange(B))
        batch.update({k: _jnp.asarray(v) for k, v in comp.items()})
        del batch["NP_sim"]

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            logits, _ = model.forward(p, state, batch, anchors, train=True,
                                      rng=rng)
            return model.loss_fn(logits, batch["label"], batch["valid"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(0)
    iters = 50

    # run the whole measured loop on device (one dispatch) so host/link
    # latency does not pollute the per-step number
    @jax.jit
    def run_steps(params, opt_state, batch):
        def body(i, carry):
            p, o, _ = carry
            return train_step(p, o, batch, jax.random.fold_in(rng, i))

        return jax.lax.fori_loop(0, iters, body,
                                 (params, opt_state, jnp.float32(0)))

    # warmup / compile
    p, o, loss = run_steps(params, opt_state, batch)
    jax.block_until_ready(loss)

    # median of 3 timed dispatches: absolute numbers drift with tunnel/chip
    # state (84-127M edges/s observed for identical code, CLAUDE.md), so a
    # single dispatch is a noisy draw; the spread is reported alongside
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        p, o, loss = run_steps(p, o, batch)
        jax.block_until_ready(loss)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    edges_per_layer = (hp.n_anchor_patches_N_in + hp.n_anchor_patches_N_out
                       + hp.n_anchor_patches_pos_in + hp.n_anchor_patches_pos_out
                       + 2 * hp.n_anchor_patches_structure)
    edges_per_step = B * C * edges_per_layer * hp.n_layers
    steps_per_s = iters / dt
    edges_per_s = edges_per_step * steps_per_s

    sampler_rate = _bench_device_sampler()   # still watchdog-protected
    _done.set()
    print(json.dumps({
        "metric": "mpn_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 3),
        "anchor_patch_samples_per_s": round(sampler_rate, 1),
        "run_spread": [round(edges_per_step * iters / t, 1) for t in times],
        "dtype": hp.dtype,
    }))


def _bench_device_sampler(n_nodes: int = 8192, n_walks: int = 4096,
                          walk_len: int = 24, rounds: int = 8) -> float:
    """Anchor patches sampled per second by the on-device triangular-walk
    sampler (sampling/device_walks.py) on a synthetic avg-degree-16 graph —
    per-chip counterpart to the reference's host NetworkX walker
    (anchor_patch_samplers.py:210-243). All `rounds` resampling rounds run
    inside one jit dispatch so the tunnel RTT stays out of the number."""
    import jax
    import jax.numpy as jnp
    import time
    from subgnn_tpu.data.graph import CSRGraph
    from subgnn_tpu.sampling.device_walks import (padded_neighbor_table,
                                                  triangular_walks_device)

    rng_np = np.random.default_rng(0)
    edges = rng_np.integers(1, n_nodes + 1, (n_nodes * 8, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    g = CSRGraph.from_edges(edges, n_nodes=n_nodes)
    nbr, degs = padded_neighbor_table(g)
    starts = jnp.asarray(g.node_ids())

    @jax.jit
    def run(key):
        def body(i, acc):
            w = triangular_walks_device(nbr, degs, starts,
                                        jax.random.fold_in(key, i),
                                        walk_len=walk_len, n_walks=n_walks,
                                        rw_beta=0.65)
            return acc + w.sum()

        return jax.lax.fori_loop(0, rounds, body, jnp.int32(0))

    jax.block_until_ready(run(jax.random.PRNGKey(0)))    # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run(jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0
    return n_walks * rounds / dt


if __name__ == "__main__":
    main()
