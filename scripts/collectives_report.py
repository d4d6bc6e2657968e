"""Report the ICI collectives GSPMD inserts for the sharded training step.

Compiles the production-shaped forward+grad step over a (data, node)
virtual CPU mesh and counts the collective ops in the optimized HLO,
with the byte volume of each — the measurement behind PERF.md's
"anchor-patch all-gather" accounting (SURVEY §2.3 deliverable). Runs
entirely on the virtual mesh; no TPU needed (GSPMD partitioning is
platform-independent).

Usage: PYTHONPATH=/root/repo python scripts/collectives_report.py \
           [-data 4] [-node 2]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# counting lives in the package so the at-scale multichip dryrun can
# assert on it (subgnn_tpu/parallel/hlo_audit.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-data", type=int, default=4)
    ap.add_argument("-node", type=int, default=2)
    args = ap.parse_args()
    n_dev = args.data * args.node

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_dev)

    import __graft_entry__ as ge
    from subgnn_tpu.parallel.mesh import (make_device_mesh, batch_pspecs,
                                          anchor_pspecs, param_pspecs,
                                          shard_tree)

    model, hp, params, state, batch, anchors = ge._build_flagship(
        n_nodes=8192, n_sub=64, C=3, L=16, n_pool=150,
        hp_overrides=dict(node_embed_size=128, n_layers=2,
                          n_anchor_patches_N_in=15, n_anchor_patches_N_out=30,
                          n_anchor_patches_pos_in=30,
                          n_anchor_patches_pos_out=60,
                          n_anchor_patches_structure=15, n_triangular_walks=5,
                          random_walk_len=10, linear_hidden_dim_1=64,
                          linear_hidden_dim_2=32))
    mesh = make_device_mesh(n_data=args.data, n_node=args.node)
    with mesh:
        sp = shard_tree(mesh, params, param_pspecs(params))
        sb = shard_tree(mesh, batch, batch_pspecs(batch))
        sa = shard_tree(mesh, anchors, anchor_pspecs(anchors))

        def step(p, b):
            def loss_fn(p):
                logits, _ = model.forward(p, state, b, sa, train=True,
                                          rng=jax.random.PRNGKey(0))
                return model.loss_fn(logits, b["label"], b["valid"])

            loss, grads = jax.value_and_grad(loss_fn)(p)
            return loss, grads

        compiled = jax.jit(step).lower(sp, sb).compile()

    from subgnn_tpu.parallel.hlo_audit import count_hlo_collectives
    audit = count_hlo_collectives(compiled.as_text())
    print(json.dumps({
        "mesh": {"data": args.data, "node": args.node},
        "collective_counts": audit["counts"],
        "collective_bytes_total": audit["bytes"],
        "examples": audit["examples"],
    }, indent=2))


if __name__ == "__main__":
    main()
