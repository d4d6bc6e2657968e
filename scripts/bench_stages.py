"""Per-stage timing breakdown of the flagship training step (PERF.md).

Differential timing of jitted sub-programs at the exact bench.py shapes.
Methodology (every pitfall below was hit by an earlier version):

  * each measured loop runs inside ONE on-device fori_loop dispatch
    (per-dispatch tunnel RTT is 28ms-1s and would otherwise dominate);
  * the loop CARRY threads the real data dependency (params/opt_state
    for the full step, an accumulator fed by the stage output otherwise)
    — a body whose result is unused is dead-code-eliminated, which
    silently deleted the backward pass from earlier measurements;
  * every stage input is perturbed by `i * 1e-30` so no iteration is
    loop-invariant — XLA hoists invariant bodies out of the loop,
    leaving an empty loop that measures pure dispatch RTT;
  * the measured empty-loop dispatch time (RTT floor) is subtracted;
  * all variants are compiled up front and timed ROUND-ROBIN, reporting
    per-variant medians, so minute-scale tunnel-throughput drift hits
    every variant equally.

Stages:
  full        fwd + bwd + Adam (the bench.py number)
  forward     fwd only                      -> bwd+opt = full - forward
  full_no_N / full_no_P / full_no_S         -> marginal channel cost
  lstm        isolated structure bi-LSTM anchor encode (same shapes)
  head        isolated 3-layer MLP head
  full_bf16   same step with bfloat16 activations

Usage: PYTHONPATH=/root/repo python scripts/bench_stages.py [-iters 30]
Writes JSON to stdout; attribution notes live in PERF.md.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def make_timer(body, init_carry, iters):
    """Compile `iters` repeats of body (carry, i) -> carry fused into one
    fori_loop dispatch; return a zero-arg callable timing one dispatch."""
    import jax

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, iters, lambda i, c: body(c, i), carry)

    jax.block_until_ready(run(init_carry))      # compile + warm

    def measure():
        t0 = time.perf_counter()
        jax.block_until_ready(run(init_carry))
        return (time.perf_counter() - t0) / iters

    return measure


def rtt_floor_timer(iters):
    """Empty-loop dispatch: measures pure dispatch/RTT cost per iter."""
    import jax
    import jax.numpy as jnp

    return make_timer(lambda c, i: c + 1e-30, jnp.float32(0), iters)


SMALL = False


def build(hp_overrides=None):
    import __graft_entry__ as ge
    B, C, n_nodes = (64, 3, 512) if SMALL else (512, 3, 8192)
    base = dict(node_embed_size=128, n_layers=2,
                n_anchor_patches_N_in=15, n_anchor_patches_N_out=30,
                n_anchor_patches_pos_in=30, n_anchor_patches_pos_out=60,
                n_anchor_patches_structure=15, n_triangular_walks=5,
                random_walk_len=10, linear_hidden_dim_1=64,
                linear_hidden_dim_2=32)
    base.update(hp_overrides or {})
    model, hp, params, state, batch, anchors = ge._build_flagship(
        n_nodes=n_nodes, n_sub=B, C=C, L=16, n_pool=150, hp_overrides=base)
    # same plan-routed embedding backward as bench.py's measured step
    from subgnn_tpu.train.plans import PlanBuilder, neigh_ids_for_batch
    builder = PlanBuilder(params["node_embed"].shape[0])
    batch["cc_plan"] = builder.build("cc", np.asarray(batch["cc_ids"]))
    batch["neigh_plan"] = builder.build(
        "neigh", neigh_ids_for_batch(anchors, np.arange(B)))
    # production compact-sims path (pre-gathered anchor columns), matching
    # bench.py; BENCH_NO_COMPACT=1 reverts to the resident NP_sim tensor
    import os
    if not os.environ.get("BENCH_NO_COMPACT") and (
            hp.use_neighborhood or hp.use_position):
        import jax.numpy as jnp
        from subgnn_tpu.train import sims as S
        comp = S.compact_sims_for_batch(np.asarray(batch["NP_sim"]), anchors,
                                        hp, np.arange(B))
        batch.update({k: jnp.asarray(v) for k, v in comp.items()})
        del batch["NP_sim"]
    return model, hp, params, state, batch, anchors


def _perturbed(batch, i):
    """Copy of batch with a per-iteration dependence on EVERY similarity
    input (defeats hoisting of any single channel — with only one key
    perturbed, XLA can hoist the other channels' MPNs out of the loop)."""
    import jax.numpy as jnp
    b = dict(batch)
    for key in ("NP_sim", "neigh_sims", "pos_in_sims", "pos_out_sims",
                "I_S_sim", "B_S_sim"):
        if key in b and b[key] is not None:
            b[key] = b[key] + i.astype(jnp.float32) * 1e-30
    return b


def step_timer(hp_overrides=None, mode="full", iters=30):
    import jax
    import jax.numpy as jnp
    import optax

    model, hp, params, state, batch, anchors = build(hp_overrides)
    rng = jax.random.PRNGKey(0)

    if mode == "forward":
        def body(carry, i):
            acc = carry
            logits, _ = model.forward(params, state, _perturbed(batch, i),
                                      anchors, train=True,
                                      rng=jax.random.fold_in(rng, i))
            return acc + logits.sum() * 1e-30

        return make_timer(body, jnp.float32(0), iters)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def body(carry, i):
        p, o = carry

        def loss_fn(p):
            logits, _ = model.forward(p, state, _perturbed(batch, i),
                                      anchors, train=True,
                                      rng=jax.random.fold_in(rng, i))
            return model.loss_fn(logits, batch["label"], batch["valid"])

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, updates), o)

    return make_timer(body, (params, opt_state), iters)


def lstm_timer(iters=30):
    """Isolated structure-anchor bi-LSTM encode at flagship shapes: the
    carry is a perturbation of the embedding table, so every iteration
    re-encodes with (slightly) fresh parameters."""
    import jax.numpy as jnp

    model, hp, params, state, batch, anchors = build()
    int_w = anchors["struc_int_walks"]
    bor_w = anchors["struc_bor_walks"]
    table0 = params["node_embed"]

    def body(carry, i):
        table = table0 + carry * 1e-30
        emb_i, emb_b = model._struct_anchor_embeds(
            params, table, int_w, bor_w, train=False, rng=None)
        return carry + (emb_i.sum() + emb_b.sum()) * 1e-30

    return make_timer(body, jnp.float32(0), iters)


def head_timer(iters=30):
    import jax
    import jax.numpy as jnp

    model, hp, params, state, batch, anchors = build()
    B = batch["cc_ids"].shape[0]
    x0 = jnp.ones((B, model.hid_dim), jnp.float32)
    h = params["head"]

    def body(carry, i):
        x = x0 + carry * 1e-30
        y = jax.nn.relu(x @ h["lin1"]["w"] + h["lin1"]["b"])
        y = jax.nn.relu(y @ h["lin2"]["w"] + h["lin2"]["b"])
        return carry + (y @ h["lin3"]["w"] + h["lin3"]["b"]).sum() * 1e-30

    return make_timer(body, jnp.float32(0), iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-iters", type=int, default=30,
                    help="on-device step repeats per timed dispatch")
    ap.add_argument("-rounds", type=int, default=9,
                    help="round-robin timing passes (median reported)")
    ap.add_argument("-small", action="store_true",
                    help="tiny shapes for a CPU smoke run")
    ap.add_argument("-cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()
    global SMALL
    SMALL = args.small
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    timers = {}
    timers["rtt_floor_s"] = rtt_floor_timer(args.iters)
    timers["full_step_s"] = step_timer(mode="full", iters=args.iters)
    timers["forward_s"] = step_timer(mode="forward", iters=args.iters)
    for ch, key in (("neighborhood", "use_neighborhood"),
                    ("position", "use_position"),
                    ("structure", "use_structure")):
        timers[f"full_no_{ch}_s"] = step_timer({key: False}, mode="full",
                                               iters=args.iters)
    timers["lstm_encode_s"] = lstm_timer(args.iters)
    timers["head_s"] = head_timer(args.iters)
    timers["full_step_bf16_s"] = step_timer({"dtype": "bfloat16"},
                                            mode="full", iters=args.iters)

    samples = {k: [] for k in timers}
    for _ in range(args.rounds):
        for k, measure in timers.items():
            samples[k].append(measure())

    out = {k: float(np.median(v)) for k, v in samples.items()}
    floor = out.pop("rtt_floor_s")
    out = {k: v - floor for k, v in out.items()}
    out["bwd_opt_s"] = out["full_step_s"] - out["forward_s"]
    for ch in ("neighborhood", "position", "structure"):
        out[f"marginal_{ch}_s"] = (out["full_step_s"]
                                   - out[f"full_no_{ch}_s"])
    spread = {k: (max(v) - min(v)) / max(np.median(v), 1e-12)
              for k, v in samples.items()}
    report = {k: round(v * 1e6, 1) for k, v in out.items()}
    report["rtt_floor_us_per_iter"] = round(floor * 1e6, 1)
    report["max_rel_spread"] = round(float(max(spread.values())), 3)
    print(json.dumps(report, indent=2), flush=True)
    print("(values in microseconds per step, RTT floor subtracted; medians "
          f"over {args.rounds} interleaved rounds)")


if __name__ == "__main__":
    main()
