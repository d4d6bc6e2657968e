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
  * three minibatch modes (train_node_emb.py:52-56): full-batch (default;
    the shipped graphs are <=60k nodes), a GraphSAINT-style random-walk
    sampler run ENTIRELY on device (stateless-RNG walks over the flat CSR
    arrays pick the node sample — O(E) memory, no padded hub-width table; the induced subgraph is a
    membership mask over the full edge arrays — static shapes, no host
    gather, same O(E) segment-sum with messages outside the sample
    zeroed), and the NeighborSampler mode (per-epoch shuffled seed-node
    batches; the sampled bipartite adjacency is an EDGE mask over the
    full arrays — preprocess.py:87-106),
  * greedy coordinate-descent hyperparameter search over the reference's
    spaces (train_node_emb.py:146-172, config_prepare_dataset.py:46-55),
  * optional loss-curve + ROC-curve plot artifacts (utils.py:117-192).

Saves <conv>_embeddings.pth (torch tensor for reference compatibility) and
a .npy twin.
"""
from __future__ import annotations

import functools
import random as pyrandom
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import CSRGraph

from ..train.metrics import binary_auc

# epochs per fused device dispatch: one multi-minute execution gets the
# axon TPU worker killed (observed: 100k nodes x 40 graphsaint epochs);
# chunking costs at most epochs/10 extra tunnel RTTs and <=2 compiles
EPOCH_DISPATCH_CHUNK = 10


def saint_dispatch_epochs(num_steps: int, n_directed_edges: int,
                          budget: int = 200_000_000) -> int:
    """Epochs per fused GraphSAINT dispatch, calibrated by EDGE-STEP work —
    deterministically (never wall-clock: the embedding draw must stay
    byte-stable across machines). The axon worker kills dispatches well
    below the documented multi-minute class at large scale — measured at
    EM-USER shapes (57k nodes / 9.17M directed edges,
    scripts/diag_emuser_emb.py): one 8-step epoch = 7.8s ran fine, the
    10-epoch ~80s dispatch died; HBM was NOT the issue (temp 1.72G of
    15.75G). 200M edge-steps/dispatch ≈ 16s there, and the old 10-epoch
    behavior is preserved for graphs under ~2.5M directed edges at
    num_steps=8.

    The budget constant is part of the BYTE-STABILITY CONTRACT: chunk
    boundaries are the rng fold points (fold_in(key, e0)), so changing
    it changes every embedding draw on graphs above the threshold. Fold
    sequences are pinned by
    test_saint_fold_points_byte_stability_contract."""
    per_epoch_work = num_steps * max(n_directed_edges, 1)
    return max(1, min(EPOCH_DISPATCH_CHUNK, budget // per_epoch_work))


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


# Bound on the (edges, hidden) message buffer: above this many directed
# edges the gather+segment_sum runs as a lax.scan over static edge chunks,
# so peak HBM holds one (EDGE_CHUNK, h) buffer instead of several (E, h)
# ones — a 6.4M-edge 128-dim graph (the HPO stand-in scale) needed 23.5G
# of 15.75G HBM with whole-array messages (round 4).
EDGE_CHUNK = 1 << 20


def _gather_segment_sum(x, src, dst, n_nodes, edge_mask, chunk):
    """segment_sum(x[src] * edge_mask, dst) with the message buffer bounded
    to `chunk` rows (None = unchunked). Pad edges target segment n_nodes
    (out of range -> dropped by segment_sum, the convention used
    throughout). Chunked and unchunked differ only in fp reduction order."""
    E = src.shape[0]
    if chunk is None or E <= chunk:
        msgs = x[src]
        if edge_mask is not None:
            msgs = msgs * edge_mask[:, None]
        return jax.ops.segment_sum(msgs, dst, num_segments=n_nodes)
    n_chunks = -(-E // chunk)
    pad = n_chunks * chunk - E
    src_c = jnp.pad(src, (0, pad)).reshape(n_chunks, chunk)
    dst_c = jnp.pad(dst, (0, pad),
                    constant_values=n_nodes).reshape(n_chunks, chunk)
    em_c = (None if edge_mask is None
            else jnp.pad(edge_mask, (0, pad)).reshape(n_chunks, chunk))

    def body(acc, ch):
        s, d, m = ch
        msgs = x[s]
        if m is not None:
            msgs = msgs * m[:, None]
        return acc + jax.ops.segment_sum(msgs, d, num_segments=n_nodes), None

    acc0 = jnp.zeros((n_nodes, x.shape[1]), x.dtype)
    acc, _ = jax.lax.scan(body, acc0, (src_c, dst_c, em_c))
    return acc


def _aggregate(x, src, dst, n_nodes, conv_type: str, deg, member=None,
               edge_mask=None, edge_chunk=EDGE_CHUNK):
    """One round of neighbor aggregation over directed edges (src -> dst).

    With `member` (float (n,) 0/1 mask) the aggregation runs on the induced
    subgraph of the member nodes embedded in full-size arrays: member
    features only, messages along member-member edges only, GCN degrees
    recomputed within the sample — the GraphSAINT minibatch as a mask
    instead of a host-side node re-indexing (static shapes for XLA).

    With `edge_mask` (float (n_edges,) 0/1) only the masked EDGES carry
    messages while every node keeps its self term — the NeighborSampler
    minibatch (reference: preprocess.py:87-106, bipartite sampled
    adjacency) as a mask over the full static edge arrays; GCN degrees
    are the masked in-degrees.
    """
    if member is not None:
        x = x * member[:, None]
    if conv_type == "gin":
        nbr = _gather_segment_sum(x, src, dst, n_nodes, edge_mask,
                                  edge_chunk)
        out = x + nbr
        return out if member is None else out * member[:, None]
    # gcn: D^-1/2 (A + I) D^-1/2 (degrees within the sample when masked)
    if member is not None:
        deg = jax.ops.segment_sum(member[src], dst, num_segments=n_nodes)
    elif edge_mask is not None:
        deg = jax.ops.segment_sum(edge_mask, dst, num_segments=n_nodes)
    norm = jax.lax.rsqrt(deg + 1.0)
    out = _gather_segment_sum(x * norm[:, None], src, dst, n_nodes,
                              edge_mask, edge_chunk)
    out = (out + x * norm[:, None]) * norm[:, None]
    return out if member is None else out * member[:, None]


def gnn_forward(params, x, src, dst, n_nodes, conv_type, deg, *,
                dropout=0.0, train=False, rng=None, member=None,
                edge_mask=None, edge_chunk=EDGE_CHUNK):
    w1, b1 = params["conv1"]["w"], params["conv1"]["b"]
    if x.shape[1] > w1.shape[1]:
        # project-first: aggregation and the linear map commute
        # (sum_nbr(x) @ W == sum_nbr(x @ W); member/GCN scalings are
        # row-wise), so aggregating the PROJECTED features moves the
        # (n_edges, d) gather from d=n_feat to d=hidden — at 100k nodes
        # with 256-dim features this halves the layer-1 HBM traffic
        h = _aggregate(x @ w1, src, dst, n_nodes, conv_type, deg, member,
                       edge_mask, edge_chunk)
        h = jax.nn.relu(h + b1)
    else:
        h = _aggregate(x, src, dst, n_nodes, conv_type, deg, member,
                       edge_mask, edge_chunk)
        h = jax.nn.relu(h @ w1 + b1)
    if train and dropout > 0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    h = _aggregate(h, src, dst, n_nodes, conv_type, deg, member, edge_mask,
                   edge_chunk)
    return h @ params["conv2"]["w"] + params["conv2"]["b"]


@functools.partial(jax.jit, static_argnames=("walk_len", "n_walks"))
def _plain_walks_device(indptr, indices, degrees, key, *, walk_len: int,
                        n_walks: int) -> jnp.ndarray:
    """(n_walks, walk_len) uniform random walks from uniform roots, 1-based
    ids, dead ends repeat the last node (GraphSAINTRandomWalkSampler
    semantics: torch_geometric random_walk; train_node_emb.py:56).

    Walks the FLAT CSR arrays (indptr/indices device copies, O(E) memory)
    instead of a padded (n, max_deg) neighbor table: on power-law graphs
    the padded table is O(n * hub_degree) — 7.8 GB alone at the EM-USER
    stand-in (57k nodes, 36k-degree hub; round 4 OOM)."""
    n = degrees.shape[0] - 1
    keys = jax.random.split(key, n_walks)

    def one_walk(k):
        kr, kw = jax.random.split(k)
        root = jax.random.randint(kr, (), 1, n + 1)

        def step(curr, kt):
            d = degrees[curr]
            idx = jax.random.randint(kt, (), 0, jnp.maximum(d, 1))
            nxt = indices[indptr[curr] + idx]
            nxt = jnp.where(d > 0, nxt, curr)
            return nxt, nxt

        _, rest = jax.lax.scan(step, root, jax.random.split(kw, walk_len - 1),
                               unroll=True)
        return jnp.concatenate([root[None], rest])

    return jax.vmap(one_walk)(keys)


def _edge_scores(emb, edges):
    return jax.nn.sigmoid((emb[edges[0]] * emb[edges[1]]).sum(axis=-1))


def _edge_nll(emb, edges, w, positive: bool, chunk):
    """sum_e w_e * -log(p_e) (positive) or -log(1-p_e) — the link-pred NLL
    over an edge array, with the (E, d) endpoint gathers bounded to
    `chunk` edges and REMATERIALIZED in the backward (jax.checkpoint on
    the scan body): at EM-USER stand-in scale the train split has 3.67M
    edges, whose whole-array endpoint gathers were 3.8GB per buffer and
    OOM'd HBM even after the SpMM was chunked (round 4). w=None means
    unweighted. Chunked vs whole-array differs only in fp reduction
    order."""
    eps = 1e-7
    E = edges.shape[1]
    if chunk is None or E <= chunk:
        s = _edge_scores(emb, edges)
        t = -jnp.log(s + eps) if positive else -jnp.log1p(-s + eps)
        return (t * w).sum() if w is not None else t.sum()
    n_chunks = -(-E // chunk)
    pad = n_chunks * chunk - E
    e_c = jnp.pad(edges, ((0, 0), (0, pad))).reshape(2, n_chunks, chunk)
    w_full = jnp.ones(E, emb.dtype) if w is None else w
    w_c = jnp.pad(w_full, (0, pad)).reshape(n_chunks, chunk)  # pad w=0

    @jax.checkpoint
    def body(acc, ch):
        e0, e1, ww = ch
        s = jax.nn.sigmoid((emb[e0] * emb[e1]).sum(axis=-1))
        t = -jnp.log(s + eps) if positive else -jnp.log1p(-s + eps)
        return acc + (t * ww).sum(), None

    acc, _ = jax.lax.scan(body, jnp.zeros((), emb.dtype),
                          (e_c[0], e_c[1], w_c))
    return acc


def build_in_edge_table(dst: np.ndarray, n: int):
    """Host-side routing for exact-k neighbor sampling: edge-array positions
    of each node's incoming edges.

    Returns (in_pos (n, max_in) int32 — positions into the directed edge
    array, pad slots = len(dst); in_valid (n, max_in) bool). Edges with
    dst >= n (mesh padding) are excluded. Memory O(n * max_in_degree) — the
    same per-node neighbor-list footprint the reference's PyG
    NeighborSampler keeps (preprocess.py:87-106).
    """
    dst = np.asarray(dst, np.int64)
    E = len(dst)
    idx = np.nonzero(dst < n)[0]
    order = np.argsort(dst[idx], kind="stable")
    positions = idx[order]
    d_sorted = dst[idx][order]
    indeg = np.bincount(d_sorted, minlength=n)
    max_in = max(int(indeg.max()) if len(indeg) else 0, 1)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(indeg, out=offs[1:])
    slot = np.arange(len(d_sorted), dtype=np.int64) - offs[d_sorted]
    in_pos = np.full((n, max_in), E, np.int64)
    in_pos[d_sorted, slot] = positions
    return in_pos.astype(np.int32), (in_pos < E)


def exact_k_edge_mask(key, in_pos, in_valid, k: int, E: int):
    """(E,) 0/1 float mask keeping exactly min(k, in_degree) incoming edges
    per node, uniformly WITHOUT replacement — the reference NeighborSampler
    semantics (preprocess.py:87-106 sizes=[nb_size]) with static shapes:
    per-slot uniform scores, per-row k-th order statistic as threshold,
    scatter back to edge positions (each edge appears in exactly one row)."""
    g = jax.random.uniform(key, in_pos.shape)
    g = jnp.where(in_valid, g, jnp.inf)
    kk = min(k, in_pos.shape[1])
    kth = -jax.lax.top_k(-g, kk)[0][:, -1]  # k-th SMALLEST per row
    sel = (g <= kth[:, None]) & in_valid
    return jnp.zeros(E + 1).at[in_pos.reshape(-1)].add(
        sel.reshape(-1).astype(jnp.float32))[:E]


def make_saint_kernels(*, n: int, conv_type: str, dropout: float, tx,
                       batch_size: int, walk_length: int, num_steps: int,
                       edge_chunk):
    """Build the jitted GraphSAINT (step, run_chunk) pair.

    Module-level factory (rather than closures inside
    train_node_embeddings) so diagnostics can AOT-compile the exact
    training step at a target graph's shapes and read
    compiled.memory_analysis() — the axon TPU worker gives no OOM
    breakdown when it dies (scripts/diag_emuser_emb.py)."""
    import optax
    sample_ids_n = batch_size * walk_length
    n_neg_saint = max(sample_ids_n // 8, 1)

    @jax.jit
    def saint_step(params, opt_state, rng, data):
        (x, src_j, dst_j, deg, train_pos, indptr_j, indices_j,
         degrees_1b) = data
        rng, kw, kd, kn1, kn2 = jax.random.split(rng, 5)
        walks = _plain_walks_device(indptr_j, indices_j, degrees_1b, kw,
                                    walk_len=walk_length,
                                    n_walks=batch_size)     # 1-based
        sample_ids = walks.reshape(-1)                       # (B*L,)
        member = jnp.zeros(n + 1).at[sample_ids].set(1.0)[1:]  # (n,)
        # negatives drawn from the sampled nodes (within-subgraph
        # negative_sampling analog, train_node_emb.py:63)
        neg = jnp.stack([
            sample_ids[jax.random.randint(kn1, (n_neg_saint,), 0,
                                          sample_ids_n)] - 1,
            sample_ids[jax.random.randint(kn2, (n_neg_saint,), 0,
                                          sample_ids_n)] - 1])
        neg = jnp.clip(neg, 0, n - 1)

        def loss_fn(p):
            emb = gnn_forward(p, x, src_j, dst_j, n, conv_type, deg,
                              dropout=dropout, train=True, rng=kd,
                              member=member, edge_chunk=edge_chunk)
            w_pos = member[train_pos[0]] * member[train_pos[1]]
            pos_term = _edge_nll(emb, train_pos, w_pos, True, edge_chunk)
            neg_term = _edge_nll(emb, neg, None, False, None)
            return (pos_term + neg_term) / (w_pos.sum() + n_neg_saint)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, rng

    @functools.partial(jax.jit, static_argnames=("n_epochs",))
    def saint_run_chunk(params, opt_state, rng, data, *, n_epochs):
        def epoch_body(carry, _):
            def step_body(c, _):
                p, o, r = c
                p, o, loss, r = saint_step(p, o, r, data)
                return (p, o, r), loss

            c, losses = jax.lax.scan(step_body, carry, None,
                                     length=num_steps)
            return c, losses.mean()

        (params, opt_state, rng), losses = jax.lax.scan(
            epoch_body, (params, opt_state, rng), None, length=n_epochs)
        return params, opt_state, losses

    return saint_step, saint_run_chunk


def train_node_embeddings(graph: CSRGraph, *, conv_type: str = "gin",
                          hidden: int = 128, out_dim: int = 64,
                          lr: float = 1e-3, weight_decay: float = 5e-4,
                          dropout: float = 0.4, epochs: int = 100,
                          seed: int = 0, features: str = "one_hot",
                          minibatch: str = "full", batch_size: int = 512,
                          walk_length: int = 32, num_steps: int = 32,
                          nb_size: int = -1, nb_exact: bool = False,
                          plots_dir: Optional[str | Path] = None,
                          log_every: int = 0,
                          mesh=None) -> Tuple[np.ndarray, Dict]:
    """Returns (embeddings (n_nodes, out_dim) float32, metrics dict).

    minibatch='graphsaint' trains each step on the induced subgraph of the
    nodes visited by `batch_size` device random walks of `walk_length`
    (num_steps minibatches per epoch, reference train_node_emb.py:52-56);
    'neighbor' is the reference's third mode (PyG NeighborSampler,
    train_node_emb.py:52-53 + preprocess.py:87-106): each epoch shuffles
    the nodes into ceil(n/batch_size) seed batches and each step trains
    on the bipartite graph of the seeds' incoming edges — realized here
    as an EDGE mask over the full static arrays (seed-destination edges
    carry messages, every node keeps its self term), matching the
    reference's one sampled adjacency reused by both conv layers. The
    shipped nb_size=-1 (config_prepare_dataset.py:52, all neighbors) is
    exact. With nb_size>0 the fast default thins each seed's in-edges
    i.i.d. with probability nb_size/deg (expected fan-in matches);
    nb_exact=True instead keeps exactly min(nb_size, deg) per seed without
    replacement — the reference's NeighborSampler distribution
    (preprocess.py:87-106) — via exact_k_edge_mask (order-statistic
    threshold over a padded incoming-edge table, still static shapes).
    'full' is one full-graph step per epoch.

    With a mesh the SpMM distributes (SURVEY §2.3 'distributed SpMM'): the
    directed EDGE arrays shard over every mesh device (features/params
    replicated), so each device scatter-adds its edge partition's messages
    and GSPMD inserts the cross-device all-reduce of the partial node sums.
    Edge padding targets segment id n (out of range -> dropped by
    segment_sum), so sharded and local runs agree to reduction order."""
    import optax

    n = graph.n_nodes
    # Convolution runs over ALL edges (train+val+test) while only train
    # edges feed the loss — the reference does the same (`model(data.x,
    # data.edge_index)` with mask-selected loss edges,
    # train_node_emb.py:63,73): link-pred "splits" gate supervision, not
    # message passing. Directed edge arrays over RAW 0-based ids, straight
    # off the CSR (a per-node Python loop costs seconds at the 100k-node
    # scale this module targets)
    counts = np.diff(graph.indptr[1:]).astype(np.int64)  # per-node degree
    src = np.repeat(np.arange(n, dtype=np.int32), counts)
    dst = (graph.indices[graph.indptr[1]:] - 1).astype(np.int32)
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
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axes = tuple(mesh.axis_names)
        n_dev = int(np.prod(list(mesh.shape.values())))
        pad_e = (-len(src)) % n_dev
        if pad_e:  # dst=n is out of range -> dropped by segment_sum
            src = np.concatenate([src, np.zeros(pad_e, np.int32)])
            dst = np.concatenate([dst, np.full(pad_e, n, np.int32)])
        edge_sh = NamedSharding(mesh, P(axes))
        rep = NamedSharding(mesh, P())
        src_j = jax.device_put(jnp.asarray(src), edge_sh)
        dst_j = jax.device_put(jnp.asarray(dst), edge_sh)
        x = jax.device_put(jnp.asarray(x), rep)
        deg = jax.device_put(deg, rep)
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
    else:
        src_j, dst_j = jnp.asarray(src), jnp.asarray(dst)
    train_pos = jnp.asarray(splits["train"])
    n_neg = max(train_pos.shape[1] // 4, 1)
    # chunked SpMM only off-mesh: reshaping a device-sharded edge axis into
    # (n_chunks, chunk) would force GSPMD reshards; with a mesh the edge
    # partition already divides the message buffer per device
    echunk = None if mesh is not None else EDGE_CHUNK
    # Large graph-wide arrays travel as jit ARGUMENTS, never closure
    # constants: traced constants are embedded verbatim in the serialized
    # HLO, which at EM-USER scale (57k nodes -> ~60MB of features+edges)
    # overflows the axon remote-compile request limit (HTTP 413).
    data = (x, src_j, dst_j, deg, train_pos)

    @jax.jit
    def step(params, opt_state, rng, data):
        x, src_j, dst_j, deg, train_pos = data
        rng, kd, kn1, kn2 = jax.random.split(rng, 4)
        neg = jnp.stack([jax.random.randint(kn1, (n_neg,), 0, n),
                         jax.random.randint(kn2, (n_neg,), 0, n)])

        def loss_fn(p):
            emb = gnn_forward(p, x, src_j, dst_j, n, conv_type, deg,
                              dropout=dropout, train=True, rng=kd,
                              edge_chunk=echunk)
            loss = (_edge_nll(emb, train_pos, None, True, echunk)
                    + _edge_nll(emb, neg, None, False, None))
            return loss / (train_pos.shape[1] + n_neg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, rng

    if minibatch == "graphsaint":
        saint_data = (*data, jnp.asarray(graph.indptr),
                      jnp.asarray(graph.indices),
                      jnp.asarray(graph.degrees.astype(np.int32)))
        saint_step, saint_run_chunk = make_saint_kernels(
            n=n, conv_type=conv_type, dropout=dropout, tx=tx,
            batch_size=batch_size, walk_length=walk_length,
            num_steps=num_steps, edge_chunk=echunk)
    elif minibatch not in ("full", "neighbor"):
        raise ValueError(minibatch)

    # Fused training loops: over the axon tunnel every host dispatch costs
    # 28ms-1s RTT, so epochs run as lax.scan dispatches (graphsaint
    # additionally scans its num_steps inner minibatches), mirroring the
    # Trainer's fused-epoch mode. Dispatches are CHUNKED to at most
    # EPOCH_DISPATCH_CHUNK epochs: a single multi-minute device execution
    # gets the axon TPU worker killed (observed at 100k nodes x 40 saint
    # epochs), and the handful of extra RTTs is negligible.
    if minibatch == "graphsaint":
        run_chunk, run_data = saint_run_chunk, saint_data
    elif minibatch == "neighbor":
        n_batches = -(-n // batch_size)
        pad_n = n_batches * batch_size - n
        # static negative count: the reference draws sampled_train//4 per
        # batch (train_node_emb.py:63); in expectation a seed batch samples
        # 2*|train|*batch_size/n directed train edges (each undirected
        # train edge fires once per seed endpoint), so num_neg ~ that // 4
        n_neg_nbr = max(2 * int(train_pos.shape[1]) * batch_size
                        // (4 * n), 1)

        if nb_exact and nb_size > 0:
            in_pos_np, in_valid_np = build_in_edge_table(np.asarray(dst), n)
            nbr_data = (*data, jnp.asarray(in_pos_np),
                        jnp.asarray(in_valid_np))
        else:
            nbr_data = data

        @functools.partial(jax.jit, static_argnames=("n_epochs",))
        def neighbor_run_chunk(params, opt_state, rng, data, *, n_epochs):
            x_, src_, dst_, deg_, train_pos_, *in_table = data
            dst_c = jnp.minimum(dst_, n)  # mesh edge-padding uses dst=n

            def epoch_body(carry, _):
                def step_body(c, seeds):
                    p, o, r = c
                    r, kd, kt, kn1, kn2 = jax.random.split(r, 5)
                    # (n+1,) 0/1 over node ids; slot n (seed padding of the
                    # last batch + mesh edge padding) forced to 0
                    mask = (jnp.zeros(n + 1).at[seeds].set(1.0)
                            .at[n].set(0.0))
                    emask = mask[dst_c]  # incoming edges of the seeds
                    if nb_size > 0 and nb_exact:
                        emask = emask * exact_k_edge_mask(
                            kt, in_table[0], in_table[1], nb_size,
                            dst_.shape[0])
                    elif nb_size > 0:
                        keep_p = jnp.minimum(1.0, nb_size / jnp.maximum(
                            deg_[jnp.minimum(dst_c, n - 1)], 1.0))
                        emask = emask * jax.random.bernoulli(
                            kt, keep_p).astype(emask.dtype)
                    # negatives among sampled nodes (the renumbered-subgraph
                    # negative_sampling analog); the seed array is the
                    # fixed-size candidate pool. The LAST batch of each
                    # epoch carries pad slots (id n): zero-WEIGHT negatives
                    # that drew a pad endpoint instead of clipping them onto
                    # a real node (clip would bias node n-1 into a standing
                    # fake negative)
                    neg_raw = jnp.stack([
                        seeds[jax.random.randint(kn1, (n_neg_nbr,), 0,
                                                 batch_size)],
                        seeds[jax.random.randint(kn2, (n_neg_nbr,), 0,
                                                 batch_size)]])
                    w_neg = ((neg_raw[0] < n) & (neg_raw[1] < n)).astype(
                        jnp.float32)
                    neg = jnp.minimum(neg_raw, n - 1)
                    seed_mask = mask[:n]

                    def loss_fn(pp):
                        emb = gnn_forward(pp, x_, src_, dst_, n, conv_type,
                                          deg_, dropout=dropout, train=True,
                                          rng=kd, edge_mask=emask,
                                          edge_chunk=echunk)
                        # an undirected train edge is sampled once per seed
                        # endpoint (twice when both ends are seeds), like
                        # the reference's directed e_id train mask
                        w_pos = (seed_mask[train_pos_[0]]
                                 + seed_mask[train_pos_[1]])
                        pos_term = _edge_nll(emb, train_pos_, w_pos, True,
                                             echunk)
                        neg_term = _edge_nll(emb, neg, w_neg, False, None)
                        return ((pos_term + neg_term)
                                / (w_pos.sum() + w_neg.sum() + 1e-7))

                    loss, grads = jax.value_and_grad(loss_fn)(p)
                    updates, o = tx.update(grads, o, p)
                    return (optax.apply_updates(p, updates), o, r), loss

                p, o, r = carry
                r, kp = jax.random.split(r)
                perm = jax.random.permutation(kp, n).astype(jnp.int32)
                batches = jnp.concatenate(
                    [perm, jnp.full((pad_n,), n, jnp.int32)]
                ).reshape(n_batches, batch_size)
                (p, o, r), losses = jax.lax.scan(step_body, (p, o, r),
                                                 batches)
                return (p, o, r), losses.mean()

            (params, opt_state, rng), losses = jax.lax.scan(
                epoch_body, (params, opt_state, rng), None, length=n_epochs)
            return params, opt_state, losses

        run_chunk, run_data = neighbor_run_chunk, nbr_data
    else:
        @functools.partial(jax.jit, static_argnames=("n_epochs",))
        def full_run_chunk(params, opt_state, rng, data, *, n_epochs):
            def body(carry, _):
                p, o, r = carry
                p, o, loss, r = step(p, o, r, data)
                return (p, o, r), loss

            (params, opt_state, rng), losses = jax.lax.scan(
                body, (params, opt_state, rng), None, length=n_epochs)
            return params, opt_state, losses

        run_chunk, run_data = full_run_chunk, data

    losses_all = []
    if minibatch == "neighbor":
        # calibrate the dispatch size by STEP count, not epoch count: the
        # known-safe envelope is graphsaint's 10 epochs x 32 steps; neighbor
        # mode runs ceil(n/batch_size) full-edge-array steps PER EPOCH, so
        # at 100k nodes / batch 512 an epoch is already ~196 steps and a
        # 10-epoch dispatch would be the multi-minute class that kills the
        # axon TPU worker (module comment above)
        chunk = max(1, (EPOCH_DISPATCH_CHUNK * 32) // (-(-n // batch_size)))
    elif minibatch == "graphsaint":
        chunk = saint_dispatch_epochs(num_steps, int(src_j.shape[0]))
    else:
        chunk = EPOCH_DISPATCH_CHUNK
    for e0 in range(0, epochs, chunk):
        n_ep = min(chunk, epochs - e0)
        # chunk 0 uses `key` itself so runs with epochs <= CHUNK are
        # bit-identical to the unchunked pre-change trainer; later chunks
        # get disjoint folded streams
        rng = key if e0 == 0 else jax.random.fold_in(key, e0)
        params, opt_state, losses = run_chunk(
            params, opt_state, rng, run_data, n_epochs=n_ep)
        losses_all.append(np.asarray(losses))
    losses = (np.concatenate(losses_all) if losses_all
              else np.zeros(0, np.float32))
    loss_history = [float(x) for x in np.asarray(losses)]
    loss = loss_history[-1] if loss_history else float("nan")
    if log_every:
        for epoch in range(0, epochs, log_every):
            print(f"node-emb epoch {epoch}: loss={loss_history[epoch]:.4f}")

    emb = gnn_forward(params, x, src_j, dst_j, n, conv_type, deg,
                      edge_chunk=echunk)
    emb_np = np.asarray(emb, dtype=np.float32)

    def eval_split(name):
        pos_e = splits[name]
        neg_e = rng_np.integers(0, n, size=pos_e.shape)
        scores = np.concatenate([
            np.asarray(_edge_scores(emb, jnp.asarray(pos_e))),
            np.asarray(_edge_scores(emb, jnp.asarray(neg_e)))])
        truth = np.concatenate([np.ones(pos_e.shape[1]),
                                np.zeros(neg_e.shape[1])])
        # acc at the reference's 0.5 threshold (utils.py:47-59) + AUC
        return (binary_auc(truth, scores),
                float(((scores >= 0.5) == truth).mean()),
                truth, scores)

    metrics = {}
    curves = {}
    for s in ("train", "val", "test"):
        auc, acc, truth, scores = eval_split(s)
        metrics[f"{s}_auc"] = auc
        metrics[f"{s}_acc"] = acc
        curves[s] = (truth, scores)
    metrics["final_loss"] = float(loss)
    metrics["emb_norm_mean"] = float(
        np.linalg.norm(emb_np, axis=1).mean())
    # GIN's sum aggregation amplifies the init scale by ~avg-degree per
    # layer; on dense graphs the sigmoid-dot link loss then saturates and
    # nothing trains (val_auc stays at 0.5 with huge row norms — measured
    # round 5 on a BA avg-degree-444 graph: norms ~3400, auc exactly
    # 0.500, while gcn reached 0.717 in the same 10 epochs). Surface it.
    if (conv_type == "gin" and metrics["val_auc"] < 0.55
            and metrics["emb_norm_mean"] > 100.0):
        import warnings
        warnings.warn(
            f"GIN pretrain looks saturated (val_auc="
            f"{metrics['val_auc']:.3f}, mean row norm "
            f"{metrics['emb_norm_mean']:.0f}); on dense graphs try "
            "conv_type='gcn' or more epochs", RuntimeWarning)
    if plots_dir is not None:
        _save_plots(Path(plots_dir), conv_type, loss_history, curves)
    return emb_np, metrics


def _save_plots(plots_dir: Path, conv_type: str, loss_history, curves):
    """Loss-curve + ROC-curve artifacts (reference: utils.py:117-192)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plots_dir.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots()
    ax.plot(loss_history)
    ax.set_xlabel("epoch"); ax.set_ylabel("train loss")
    fig.savefig(plots_dir / f"{conv_type}_loss_curve.png", dpi=80)
    plt.close(fig)

    fig, ax = plt.subplots()
    for split, (truth, scores) in curves.items():
        order = np.argsort(-scores)
        t = truth[order]
        tpr = np.cumsum(t) / max(t.sum(), 1)
        fpr = np.cumsum(1 - t) / max((1 - t).sum(), 1)
        ax.plot(fpr, tpr, label=split)
    ax.plot([0, 1], [0, 1], "k--", lw=0.5)
    ax.set_xlabel("FPR"); ax.set_ylabel("TPR"); ax.legend()
    fig.savefig(plots_dir / f"{conv_type}_roc_curve.png", dpi=80)
    plt.close(fig)


# Reference search spaces (config_prepare_dataset.py:46-55)
SEARCH_SPACES = {
    "batch_size": [512, 1024],
    "hidden": [128, 256],
    "out_dim": [64],
    "lr": [0.001, 0.005],
    "weight_decay": [5e-4, 5e-5],
    "dropout": [0.4, 0.5],
    "walk_length": [32],
    "num_steps": [32],
    "nb_size": [-1],  # POSSIBLE_NB_SIZE (NeighborSampler mode only)
}


def greedy_hyperparam_search(graph: CSRGraph, *, conv_type: str = "gin",
                             minibatch: str = "full", epochs: int = 50,
                             seed: int = 0, nb_size: Optional[int] = None,
                             nb_exact: bool = False, log_fn=None):
    """Greedy coordinate-descent over the reference's spaces
    (train_node_emb.py:146-172): hyperparameter TYPES are visited in a
    shuffled order; within a type every value is tried (shuffled) with the
    other coordinates at their current-best values; the best-so-far model by
    val accuracy is kept across ALL runs.

    Returns (best_embeddings, best_metrics, best_hyperparameters).
    """
    spaces = dict(SEARCH_SPACES)
    if minibatch != "graphsaint":
        spaces.pop("walk_length"); spaces.pop("num_steps")
    if minibatch != "neighbor":
        spaces.pop("nb_size", None)
    elif nb_size is not None:
        # honor an explicitly requested fan-in instead of silently searching
        # the default space (cli/prepare_dataset.py -emb_nb_size)
        spaces["nb_size"] = [nb_size]
    if minibatch == "full":
        spaces.pop("batch_size")
    shuffler = pyrandom.Random(seed)
    current = {k: v[0] for k, v in spaces.items()}
    best = {"val_acc": -1.0, "emb": None, "metrics": None, "hp": dict(current)}
    types = list(spaces)
    shuffler.shuffle(types)
    seen = set()  # configs already trained: each later coordinate's sweep
    for param_type in types:  # revisits the settled incumbent — skip it
        vals = list(spaces[param_type])
        shuffler.shuffle(vals)
        for val in vals:
            current[param_type] = val
            key = tuple(sorted(current.items()))
            if key in seen:
                continue
            seen.add(key)
            emb, metrics = train_node_embeddings(
                graph, conv_type=conv_type, minibatch=minibatch,
                epochs=epochs, seed=seed, nb_exact=nb_exact, **current)
            if log_fn:
                log_fn(f"greedy {current} -> val_acc={metrics['val_acc']:.4f}"
                       f" val_auc={metrics['val_auc']:.4f}")
            if metrics["val_acc"] >= best["val_acc"]:
                best = {"val_acc": metrics["val_acc"], "emb": emb,
                        "metrics": metrics, "hp": dict(current)}
        # settle this coordinate at the best value seen so far
        current[param_type] = best["hp"][param_type]
    return best["emb"], best["metrics"], best["hp"]


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
