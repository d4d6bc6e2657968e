"""Diagnose the EM-USER GraphSAINT pretraining TPU-worker crash (round 4).

Three crashes on this path so far: (1) whole-array SpMM messages (fixed:
EDGE_CHUNK), (2) the padded neighbor table (fixed: flat-CSR walks), and
now (3) an unexplained worker death with chunked SpMM + chunked NLL. The
axon worker dies without an OOM breakdown, so this probes in order of
increasing risk, printing findings BEFORE each dispatch:

  1. AOT-compile saint_step at EM-USER shapes -> memory_analysis()
     (no execution; catches static OOM with exact byte counts).
  2. One saint_step dispatch, timed.
  3. One 1-epoch run_chunk dispatch (num_steps inner steps), timed.
  4. The production 10-epoch chunk, timed — if 1-3 pass and 4 kills the
     worker, the per-dispatch runtime cap is the culprit and
     EPOCH_DISPATCH_CHUNK must scale down with graph size.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_emuser_emb.py
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import optax

from subgnn_tpu.data.graph import CSRGraph
from subgnn_tpu.prepare.node_emb import EDGE_CHUNK, make_saint_kernels


def main():
    print("devices:", jax.devices(), flush=True)
    g = CSRGraph.from_edgelist(REPO / "data/em_user/edge_list.txt")
    n = g.n_nodes
    print(f"graph: {n} nodes, {g.indices.shape[0]} directed edges",
          flush=True)

    # mirror train_node_embeddings' setup at the make_real_standins call
    # (dim=128, graphsaint, batch_size=512, walk_length=16, num_steps=8)
    hidden, out_dim, batch_size, walk_length, num_steps = 128, 128, 512, 16, 8
    counts = np.diff(g.indptr[1:]).astype(np.int64)
    src = np.repeat(np.arange(n, dtype=np.int32), counts)
    dst = (g.indices[g.indptr[1]:] - 1).astype(np.int32)
    deg = jnp.asarray(g.degrees[1:].astype(np.float32))
    und = src < dst
    pos = np.stack([src[und], dst[und]])
    rng_np = np.random.default_rng(0)
    perm = rng_np.permutation(pos.shape[1])
    train_pos = jnp.asarray(pos[:, perm[:8 * len(perm) // 10]])
    n_feat = 256
    x = jax.random.normal(jax.random.PRNGKey(7), (n, n_feat)) / jnp.sqrt(n_feat)

    from subgnn_tpu.prepare.node_emb import init_gnn_params
    key = jax.random.PRNGKey(0)
    params = init_gnn_params(key, n_feat, hidden, out_dim)
    tx = optax.adamw(1e-3, weight_decay=5e-4)
    opt_state = tx.init(params)
    data = (x, jnp.asarray(src), jnp.asarray(dst), deg, train_pos,
            jnp.asarray(g.indptr), jnp.asarray(g.indices),
            jnp.asarray(g.degrees.astype(np.int32)))
    print(f"train_pos: {train_pos.shape[1]} edges; "
          f"x: {x.shape}; EDGE_CHUNK={EDGE_CHUNK}", flush=True)

    saint_step, saint_run_chunk = make_saint_kernels(
        n=n, conv_type="gin", dropout=0.4, tx=tx, batch_size=batch_size,
        walk_length=walk_length, num_steps=num_steps, edge_chunk=EDGE_CHUNK)

    # ---- probe 1: AOT memory analysis, no execution
    t0 = time.time()
    lowered = saint_step.lower(params, opt_state, key, data)
    compiled = lowered.compile()
    print(f"[1] saint_step compiled in {time.time()-t0:.1f}s", flush=True)
    try:
        ma = compiled.memory_analysis()
        print(f"[1] memory_analysis: {ma}", flush=True)
    except Exception as e:  # some backends don't expose it
        print(f"[1] memory_analysis unavailable: {e}", flush=True)

    # ---- probe 2: one step
    t0 = time.time()
    p, o, loss, r = compiled(params, opt_state, key, data)
    loss.block_until_ready()
    print(f"[2] one saint_step: loss={float(loss):.4f} "
          f"({time.time()-t0:.1f}s incl. H2D)", flush=True)
    t0 = time.time()
    p, o, loss, r = compiled(params, opt_state, r, data)
    loss.block_until_ready()
    print(f"[2] second saint_step: {time.time()-t0:.2f}s", flush=True)

    # ---- probe 3: one fused epoch (num_steps steps)
    t0 = time.time()
    lowered = saint_run_chunk.lower(params, opt_state, key, data, n_epochs=1)
    compiled1 = lowered.compile()
    print(f"[3] 1-epoch chunk compiled in {time.time()-t0:.1f}s", flush=True)
    try:
        print(f"[3] memory_analysis: {compiled1.memory_analysis()}",
              flush=True)
    except Exception as e:
        print(f"[3] memory_analysis unavailable: {e}", flush=True)
    t0 = time.time()
    p, o, losses = compiled1(params, opt_state, key, data)
    jax.block_until_ready(losses)
    print(f"[3] 1-epoch chunk ran in {time.time()-t0:.1f}s "
          f"(mean loss {float(losses.mean()):.4f})", flush=True)

    # ---- probe 4: the production 10-epoch chunk
    t0 = time.time()
    p, o, losses = saint_run_chunk(params, opt_state, key, data, n_epochs=10)
    jax.block_until_ready(losses)
    print(f"[4] 10-epoch chunk ran in {time.time()-t0:.1f}s "
          f"(losses {np.asarray(losses).round(3).tolist()})", flush=True)
    print("DIAG OK — the crash is not reproducible at these shapes",
          flush=True)


if __name__ == "__main__":
    main()
