"""Self-supervised node-embedding pretrainer (GIN / GCN link prediction).

Replaces the reference's torch-geometric trainer
(reference: prepare_dataset/train_node_emb.py, model.py:15-36,
preprocess.py:27-86, utils.py:22-59) with a jit-compiled JAX trainer:

  * 2-layer GIN (h' = Linear(h + sum_nbr h), GINConv eps=0) or GCN
    (symmetric-normalized adjacency with self loops),
  * neighbor aggregation as segment_sum over the directed edge array
    (device-side SpMM; one-hot features make layer 1 a dense matmul),
  * link prediction: sigmoid(dot(h_u, h_v)) edge scores, NLL over positive
    edges + 1/4-ratio uniform negative samples per step
    (train_node_emb.py:63: num_neg = pos//4),
  * edges split 80/10/10 into train/val/test scoring sets
    (preprocess.py:64-82),
  * full-batch training (the shipped graphs are <=60k nodes; GraphSAINT
    subsampling is unnecessary on TPU at this scale).

Saves <conv>_embeddings.pth (torch tensor for reference compatibility) and
a .npy twin.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import CSRGraph
from ..train.metrics import binary_auc


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _linear(key, d_in, d_out):
    k1, k2 = jax.random.split(key)
    b = 1.0 / jnp.sqrt(d_in)
    return {"w": _uniform(k1, (d_in, d_out), b), "b": _uniform(k2, (d_out,), b)}


def init_gnn_params(key, n_feat: int, n_hid: int, n_out: int):
    k1, k2 = jax.random.split(key)
    return {"conv1": _linear(k1, n_feat, n_hid),
            "conv2": _linear(k2, n_hid, n_out)}


def _aggregate(x, src, dst, n_nodes, conv_type: str, deg):
    """One round of neighbor aggregation over directed edges (src -> dst)."""
    if conv_type == "gin":
        nbr = jax.ops.segment_sum(x[src], dst, num_segments=n_nodes)
        return x + nbr
    # gcn: D^-1/2 (A + I) D^-1/2
    norm = jax.lax.rsqrt(deg + 1.0)
    msgs = (x * norm[:, None])[src]
    out = jax.ops.segment_sum(msgs, dst, num_segments=n_nodes)
    return (out + x * norm[:, None]) * norm[:, None]


def gnn_forward(params, x, src, dst, n_nodes, conv_type, deg, *,
                dropout=0.0, train=False, rng=None):
    h = _aggregate(x, src, dst, n_nodes, conv_type, deg)
    h = jax.nn.relu(h @ params["conv1"]["w"] + params["conv1"]["b"])
    if train and dropout > 0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    h = _aggregate(h, src, dst, n_nodes, conv_type, deg)
    return h @ params["conv2"]["w"] + params["conv2"]["b"]


def _edge_scores(emb, edges):
    return jax.nn.sigmoid((emb[edges[0]] * emb[edges[1]]).sum(axis=-1))


def train_node_embeddings(graph: CSRGraph, *, conv_type: str = "gin",
                          hidden: int = 128, out_dim: int = 64,
                          lr: float = 1e-3, weight_decay: float = 5e-4,
                          dropout: float = 0.4, epochs: int = 100,
                          seed: int = 0, features: str = "one_hot",
                          log_every: int = 0) -> Tuple[np.ndarray, Dict]:
    """Returns (embeddings (n_nodes, out_dim) float32, metrics dict)."""
    import optax

    n = graph.n_nodes
    # directed edge arrays over RAW 0-based ids
    src_list, dst_list = [], []
    for v in range(1, n + 1):
        nbrs = graph.neighbors(v)
        src_list.append(np.full(len(nbrs), v - 1, dtype=np.int32))
        dst_list.append((nbrs - 1).astype(np.int32))
    src = np.concatenate(src_list)
    dst = np.concatenate(dst_list)
    deg = jnp.asarray(graph.degrees[1:].astype(np.float32))

    # undirected positive edges (u < v), split 80/10/10
    und = src < dst
    pos = np.stack([src[und], dst[und]])
    rng_np = np.random.default_rng(seed)
    perm = rng_np.permutation(pos.shape[1])
    n_tr = 8 * len(perm) // 10
    n_va = len(perm) // 10
    splits = {"train": pos[:, perm[:n_tr]],
              "val": pos[:, perm[n_tr:n_tr + n_va]],
              "test": pos[:, perm[n_tr + n_va:]]}

    if features == "one_hot" and n <= 8192:
        x = jnp.eye(n, dtype=jnp.float32)
        n_feat = n
    elif features == "one_hot":
        # large graphs: a fixed random projection of the identity (keeps
        # per-node distinguishability at O(n*d) instead of O(n^2) memory;
        # documented deviation from the reference's full one-hot)
        n_feat = 256
        x = jax.random.normal(jax.random.PRNGKey(7), (n, n_feat)) / jnp.sqrt(n_feat)
    else:
        n_feat = 20
        x = jnp.ones((n, n_feat), jnp.float32)

    key = jax.random.PRNGKey(seed)
    key, k = jax.random.split(key)
    params = init_gnn_params(k, n_feat, hidden, out_dim)
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)
    src_j, dst_j = jnp.asarray(src), jnp.asarray(dst)
    train_pos = jnp.asarray(splits["train"])
    n_neg = max(train_pos.shape[1] // 4, 1)

    @jax.jit
    def step(params, opt_state, rng):
        rng, kd, kn1, kn2 = jax.random.split(rng, 4)
        neg = jnp.stack([jax.random.randint(kn1, (n_neg,), 0, n),
                         jax.random.randint(kn2, (n_neg,), 0, n)])

        def loss_fn(p):
            emb = gnn_forward(p, x, src_j, dst_j, n, conv_type, deg,
                              dropout=dropout, train=True, rng=kd)
            pos_s = _edge_scores(emb, train_pos)
            neg_s = _edge_scores(emb, neg)
            eps = 1e-7
            loss = -(jnp.log(pos_s + eps).sum() + jnp.log(1 - neg_s + eps).sum())
            return loss / (train_pos.shape[1] + n_neg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, rng

    for epoch in range(epochs):
        params, opt_state, loss, key = step(params, opt_state, key)
        if log_every and epoch % log_every == 0:
            print(f"node-emb epoch {epoch}: loss={float(loss):.4f}")

    emb = gnn_forward(params, x, src_j, dst_j, n, conv_type, deg)
    emb_np = np.asarray(emb, dtype=np.float32)

    def eval_split(name):
        pos_e = splits[name]
        neg_e = rng_np.integers(0, n, size=pos_e.shape)
        scores = np.concatenate([
            np.asarray(_edge_scores(emb, jnp.asarray(pos_e))),
            np.asarray(_edge_scores(emb, jnp.asarray(neg_e)))])
        truth = np.concatenate([np.ones(pos_e.shape[1]),
                                np.zeros(neg_e.shape[1])])
        return binary_auc(truth, scores)

    metrics = {f"{s}_auc": eval_split(s) for s in ("train", "val", "test")}
    metrics["final_loss"] = float(loss)
    return emb_np, metrics


def save_embeddings(out_dir: str | Path, emb: np.ndarray, conv_type: str):
    """Write <conv>_embeddings.pth (torch, reference-compatible) + .npy."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    name = "gin" if conv_type == "gin" else "graphsaint_gcn"
    np.save(out_dir / f"{name}_embeddings.npy", emb)
    try:
        import torch
        torch.save(torch.tensor(emb), out_dir / f"{name}_embeddings.pth")
    except ImportError:
        pass
