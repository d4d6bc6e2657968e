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
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8}

COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all")


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


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

    txt = compiled.as_text()
    counts = defaultdict(int)
    bytes_by_op = defaultdict(int)
    examples = defaultdict(list)
    for line in txt.splitlines():
        for op in COLLECTIVES:
            marker = f" {op}(" if f" {op}(" in line else (
                f" {op}-start(" if f" {op}-start(" in line else None)
            if marker is None:
                continue
            # sum every shape in the OUTPUT (the `%name = <ty>` part left
            # of the op name) — collectives are often variadic tuples
            out_part = line.split(marker)[0]
            shapes = re.findall(r"\w+\[[\d,]*\]", out_part)
            total = sum(shape_bytes(s) for s in shapes)
            counts[op] += 1
            bytes_by_op[op] += total
            if len(examples[op]) < 4:
                big = max(shapes, key=shape_bytes) if shapes else "?"
                examples[op].append(
                    f"{len(shapes)}-tuple, {total/1e6:.2f} MB total,"
                    f" largest {big}")
            break

    print(json.dumps({
        "mesh": {"data": args.data, "node": args.node},
        "collective_counts": dict(counts),
        "collective_bytes_total": dict(bytes_by_op),
        "examples": {k: v for k, v in examples.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
