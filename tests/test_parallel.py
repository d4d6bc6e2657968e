"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from subgnn_tpu.parallel.mesh import (
    make_device_mesh, batch_pspecs, anchor_pspecs, param_pspecs, shard_tree)


def test_mesh_construction():
    mesh = make_device_mesh(n_data=4, n_node=2)
    assert mesh.shape == {"data": 4, "node": 2}
    mesh1 = make_device_mesh()
    assert mesh1.shape["data"] * mesh1.shape["node"] == len(jax.devices())


def test_batch_pspecs():
    batch = {"cc_ids": np.zeros((8, 2, 3)), "NP_sim": np.zeros((8, 2, 16)),
             "I_S_sim": None, "label": np.zeros(8)}
    specs = batch_pspecs(batch)
    assert specs["NP_sim"] == P("data", None, "node")
    assert specs["cc_ids"] == P("data")
    assert specs["I_S_sim"] is None


def test_dryrun_multichip_8_devices():
    # full=False: the at-scale tail has its own dedicated test below
    # (test_dryrun_multichip_full_at_scale) — no need to run it 3x
    import __graft_entry__ as ge
    ge.dryrun_multichip(8, full=False)


def test_dryrun_multichip_2_devices():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2, full=False)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 4)
    assert bool(jnp.isfinite(out).all())


def test_sharded_forward_matches_single_device():
    """DP+node-sharded forward must be numerically identical to local."""
    import __graft_entry__ as ge
    model, hp, params, state, batch, anchors = ge._build_flagship(
        n_nodes=128, n_sub=8, C=2, L=4, n_pool=16,
        hp_overrides=dict(node_embed_size=16, n_layers=1,
                          n_anchor_patches_N_in=3, n_anchor_patches_N_out=3,
                          n_anchor_patches_pos_in=3, n_anchor_patches_pos_out=3,
                          n_anchor_patches_structure=3, n_triangular_walks=2,
                          random_walk_len=4, linear_hidden_dim_1=8,
                          linear_hidden_dim_2=8))
    local_logits, _ = model.forward(params, state, batch, anchors,
                                    train=False, rng=None)
    mesh = make_device_mesh(n_data=4, n_node=2)
    with mesh:
        sp = shard_tree(mesh, params, param_pspecs(params))
        sb = shard_tree(mesh, batch, batch_pspecs(batch))
        sa = shard_tree(mesh, anchors, anchor_pspecs(anchors))

        @jax.jit
        def fwd(p, b):
            logits, _ = model.forward(p, state, b, sa, train=False, rng=None)
            return logits

        sharded_logits = fwd(sp, sb)
    np.testing.assert_allclose(np.asarray(local_logits),
                               np.asarray(sharded_logits), atol=1e-4)


def test_node_sharded_forward_emits_collectives():
    """With the embedding table sharded over 'node', the per-batch anchor
    gathers must lower to ICI collectives (all-gather / all-to-all /
    collective-permute inserted by GSPMD), not to a full-table replication
    on every device — the SURVEY §2.3 'anchor-patch all-gather'
    deliverable, made explicit and regression-guarded."""
    import __graft_entry__ as ge
    model, hp, params, state, batch, anchors = ge._build_flagship(
        n_nodes=128, n_sub=8, C=2, L=4, n_pool=16,
        hp_overrides=dict(node_embed_size=16, n_layers=1,
                          n_anchor_patches_N_in=3, n_anchor_patches_N_out=3,
                          n_anchor_patches_pos_in=3, n_anchor_patches_pos_out=3,
                          n_anchor_patches_structure=3, n_triangular_walks=2,
                          random_walk_len=4, linear_hidden_dim_1=8,
                          linear_hidden_dim_2=8))
    mesh = make_device_mesh(n_data=2, n_node=4)
    with mesh:
        sp = shard_tree(mesh, params, param_pspecs(params))
        sb = shard_tree(mesh, batch, batch_pspecs(batch))
        sa = shard_tree(mesh, anchors, anchor_pspecs(anchors))

        @jax.jit
        def fwd(p, b):
            logits, _ = model.forward(p, state, b, sa, train=False, rng=None)
            return logits

        hlo = fwd.lower(sp, sb).compile().as_text()
    # GSPMD implements the sharded-table row gather as a masked gather of
    # each device's shard followed by a cross-device sum (partial-gather +
    # all-reduce); all-gather/all-to-all are the other legal lowerings
    assert any(op in hlo for op in
               ("all-reduce", "all-gather", "all-to-all",
                "collective-permute")), \
        "node-sharded forward compiled without any cross-device collective"


def test_sharded_trainer_fit_matches_single_device():
    """The PRODUCTION Trainer on a (data=4, node=2) mesh must reproduce the
    single-device training trajectory (fused-epoch scan + GatherPlans +
    compact sims + trainable CC tables all engaged)."""
    import __graft_entry__ as ge
    from subgnn_tpu.train.loop import Trainer

    def run(mesh_axes):
        model, hp, params, state, data, anchors, eval_cc = \
            ge._build_training_fixture(
                n_train=16, n_val=8,
                hp_overrides=dict(batch_size=8, max_epochs=3,
                                  trainable_cc=True, **mesh_axes))
        tr = Trainer(model, hp, eval_cc_tables=eval_cc)
        tr.compact_sims = True
        tr.fit(params, state, data["train"], data["val"], anchors,
               seed=0, log_fn=None)
        assert hasattr(tr, "_fused_train_epoch")
        return tr

    t_local = run({})
    t_mesh = run(dict(mesh_data_axis=4, mesh_node_axis=2))
    assert t_mesh.mesh is not None and t_local.mesh is None
    for m1, m2 in zip(t_local.metric_scores, t_mesh.metric_scores):
        np.testing.assert_allclose(m1["train_loss"], m2["train_loss"],
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(m1["val_loss"], m2["val_loss"],
                                   rtol=2e-4, atol=1e-5)
        assert m1["val_micro_f1"] == pytest.approx(m2["val_micro_f1"])


def test_sharded_trainer_streaming_matches_single_device():
    """Same trajectory check for the per-step streaming path (fused mode
    off via a short-batch train split: batch_size > n_train disables
    drop_last)."""
    import __graft_entry__ as ge
    from subgnn_tpu.train.loop import Trainer

    def run(mesh_axes):
        model, hp, params, state, data, anchors, eval_cc = \
            ge._build_training_fixture(
                n_train=12, n_val=8,
                hp_overrides=dict(batch_size=16, max_epochs=2, **mesh_axes))
        tr = Trainer(model, hp)
        tr.compact_sims = False
        tr.fit(params, state, data["train"], data["val"], anchors,
               seed=0, log_fn=None)
        assert not hasattr(tr, "_fused_train_epoch")
        return tr

    t_local = run({})
    t_mesh = run(dict(mesh_data_axis=8, mesh_node_axis=1))
    for m1, m2 in zip(t_local.metric_scores, t_mesh.metric_scores):
        np.testing.assert_allclose(m1["train_loss"], m2["train_loss"],
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(m1["val_loss"], m2["val_loss"],
                                   rtol=2e-4, atol=1e-5)


def _random_csr(rng, n=96, m=300):
    from subgnn_tpu.data.graph import CSRGraph
    edges = rng.integers(1, n + 1, (m, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    return CSRGraph.from_edges(edges, n_nodes=n)


def test_precompute_np_sims_mesh_matches_host():
    """The mesh-sharded NP-sim CC-min reduction reproduces the host loop
    exactly (column axis sharded over all 8 devices; n_nodes not divisible
    by the device count to exercise the pad path)."""
    from subgnn_tpu.precompute.similarities import (
        compute_shortest_path_similarities)

    rng = np.random.default_rng(1)
    n_nodes, n_sub, C, L = 77, 11, 3, 5
    sp = rng.integers(0, 9, (n_nodes, n_nodes)).astype(np.float32)
    cc_ids = rng.integers(0, n_nodes + 1, (n_sub, C, L)).astype(np.int32)
    cc_ids[:, :, 0] = rng.integers(1, n_nodes + 1, (n_sub, C))  # row 0 real
    cc_ids[2, 1:] = 0  # an empty CC -> PAD fill
    host = compute_shortest_path_similarities(sp, cc_ids)
    mesh = make_device_mesh(n_data=4, n_node=2)
    dev = compute_shortest_path_similarities(sp, cc_ids, mesh=mesh)
    np.testing.assert_array_equal(host, dev)


def test_precompute_structure_sims_mesh_matches_host():
    from subgnn_tpu.precompute.similarities import (
        compute_structure_similarities)

    rng = np.random.default_rng(2)
    g = _random_csr(rng)
    cc_ids = rng.integers(0, g.n_nodes + 1, (6, 2, 4)).astype(np.int32)
    cc_ids[:, 0, 0] = rng.integers(1, g.n_nodes + 1, 6)
    anchors = rng.integers(1, g.n_nodes + 1, (9, 5)).astype(np.int32)
    for internal in (True, False):
        local = compute_structure_similarities(g, cc_ids, anchors, internal)
        mesh = make_device_mesh(n_data=8, n_node=1)
        sharded = compute_structure_similarities(g, cc_ids, anchors,
                                                 internal, mesh=mesh)
        np.testing.assert_allclose(local, sharded, atol=1e-6)


def test_bfs_device_mesh_matches_host():
    from subgnn_tpu.precompute.shortest_paths import shortest_path_matrix

    rng = np.random.default_rng(3)
    g = _random_csr(rng, n=60, m=150)
    host = shortest_path_matrix(g, backend="host")
    mesh = make_device_mesh(n_data=4, n_node=2)
    dev = shortest_path_matrix(g, mesh=mesh)
    np.testing.assert_array_equal(host, dev)


def test_pipeline_precompute_takes_mesh(tmp_path):
    """runner.precompute(mesh=...) produces identical artifacts to the
    single-device run (the artifact-equality gate for distributed
    precompute; wall-time scaling is measured on real chips)."""
    import json
    from subgnn_tpu.config import HParams, RunConfig
    from subgnn_tpu.train.runner import SubGNNPipeline

    src = "data/density"
    import os
    if not os.path.exists(src):
        pytest.skip("density dataset not present")

    def run_precompute(root, mesh):
        import shutil
        task = root / "density"
        task.mkdir(parents=True)
        for f in ("edge_list.txt", "subgraphs.pth", "gin_embeddings.npy",
                  "shortest_path_matrix.npy"):
            p = os.path.join(src, f)
            if os.path.exists(p):
                shutil.copy(p, task / f)
        rc = RunConfig(task="density", project_root=root)
        hp = HParams(max_epochs=0, max_sim_epochs=1, n_triangular_walks=2,
                     random_walk_len=4, sample_walk_len=10)
        pipe = SubGNNPipeline(rc, hp)
        pipe.load()
        pipe.precompute(mesh=mesh)
        return pipe

    p1 = run_precompute(tmp_path / "local", None)
    p2 = run_precompute(tmp_path / "mesh", make_device_mesh(n_data=4,
                                                            n_node=2))
    for s in ("train", "val", "test"):
        np.testing.assert_array_equal(p1.np_sim[s], p2.np_sim[s])
        np.testing.assert_allclose(p1.int_s_sim[s], p2.int_s_sim[s],
                                   atol=1e-6)
        np.testing.assert_allclose(p1.bor_s_sim[s], p2.bor_s_sim[s],
                                   atol=1e-6)


def test_dtw_shards_over_mesh():
    """Distributed precompute: the batched DTW kernel data-parallelizes over
    the mesh's pair axis (each device computes its shard; results identical
    to single-device)."""
    from jax.sharding import NamedSharding
    from subgnn_tpu.precompute.dtw import dtw_distance_batch

    rng = np.random.default_rng(0)
    N, L = 64, 12
    a = np.sort(rng.integers(0, 9, (N, L)).astype(np.float32), axis=1)
    b = np.sort(rng.integers(0, 9, (N, L)).astype(np.float32), axis=1)
    la = rng.integers(1, L + 1, N).astype(np.int32)
    lb = rng.integers(1, L + 1, N).astype(np.int32)

    local = np.asarray(dtw_distance_batch(jnp.asarray(a), jnp.asarray(la),
                                          jnp.asarray(b), jnp.asarray(lb)))
    mesh = make_device_mesh(n_data=8, n_node=1)
    sharding = NamedSharding(mesh, P("data"))
    args = [jax.device_put(jnp.asarray(x), sharding) for x in (a, la, b, lb)]
    with mesh:
        sharded = np.asarray(dtw_distance_batch(args[0], args[1],
                                                args[2], args[3]))
    np.testing.assert_allclose(local, sharded, atol=1e-5)


def test_bfs_graph_partitioned_matches_host():
    """Edge-partitioned BFS with per-level all-gather frontier exchange
    (parallel/partition.py) reproduces the host matrix exactly — including
    disconnected components (unreached=0) and n not divisible by the
    device count (column padding)."""
    from subgnn_tpu.precompute.shortest_paths import shortest_path_matrix

    rng = np.random.default_rng(5)
    g = _random_csr(rng, n=61, m=130)  # 61 % 8 != 0 exercises padding
    host = shortest_path_matrix(g, backend="host")
    mesh = make_device_mesh(n_data=8, n_node=1)
    dev = shortest_path_matrix(g, mesh=mesh, partition="graph")
    np.testing.assert_array_equal(host, dev)


def test_padded_adjacency_partition():
    from subgnn_tpu.parallel.partition import padded_adjacency

    rng = np.random.default_rng(6)
    g = _random_csr(rng, n=10, m=20)
    full, n_pad = padded_adjacency(g, 4)
    assert n_pad == 12 and full.shape == (12, 12)
    assert not full[10:].any() and not full[:, 10:].any()  # zero padding
    assert np.array_equal(full[:10, :10], full[:10, :10].T)
    degs = full.sum(axis=1)[:10]
    assert np.array_equal(degs, g.degrees[1:].astype(degs.dtype))
    # device d's edge partition is the contiguous column block [d*w,(d+1)*w)
    w = n_pad // 4
    assert np.array_equal(np.concatenate(
        [full[:, d * w:(d + 1) * w] for d in range(4)], axis=1), full)


def test_precompute_np_sims_mesh_row_subset():
    """The mesh CC-min reduction must handle a rectangular row-subset
    path matrix (the EM-USER-scale path: BFS rows from CC sources only,
    cc ids remapped into row space)."""
    import networkx as nx
    from subgnn_tpu.data.graph import CSRGraph
    from subgnn_tpu.data.dataset import initialize_cc_ids
    from subgnn_tpu.precompute.shortest_paths import (shortest_path_matrix,
                                                      shortest_path_rows)
    from subgnn_tpu.precompute.similarities import (
        compute_shortest_path_similarities)
    rng = np.random.default_rng(7)
    g = nx.barabasi_albert_graph(60, 2, seed=3)
    edges = np.asarray(list(g.edges()), dtype=np.int64) + 1
    csr = CSRGraph.from_edges(edges, n_nodes=60)
    subgraphs = [(rng.choice(60, size=5, replace=False) + 1).tolist()
                 for _ in range(5)]
    cc_ids = initialize_cc_ids(csr, subgraphs)
    sp = shortest_path_matrix(csr, backend="host")
    full = compute_shortest_path_similarities(sp, cc_ids)

    srcs = np.unique(cc_ids.ravel())
    srcs = srcs[srcs != 0].astype(np.int64)
    rows = shortest_path_rows(csr, srcs)
    lut = np.zeros(csr.n_nodes + 1, np.int32)
    lut[srcs] = np.arange(1, len(srcs) + 1, dtype=np.int32)
    mesh = make_device_mesh(n_data=4, n_node=2)
    dev = compute_shortest_path_similarities(rows, lut[cc_ids], mesh=mesh)
    assert dev.shape == full.shape
    assert np.allclose(dev, full)


def test_node_emb_distributed_spmm_matches_local():
    """SURVEY §2.3 'distributed SpMM': node-emb pretraining with the edge
    arrays sharded over an 8-device mesh must (a) reproduce the local run
    (same keys; reduction-order tolerance) and (b) actually compile to a
    cross-device reduction of the partial node sums."""
    import networkx as nx
    import jax.numpy as jnp
    from subgnn_tpu.data.graph import CSRGraph
    from subgnn_tpu.prepare.node_emb import train_node_embeddings, gnn_forward
    from jax.sharding import NamedSharding, PartitionSpec as P

    g = nx.barabasi_albert_graph(120, 3, seed=0)
    edges = np.asarray(list(g.edges()), dtype=np.int64) + 1
    csr = CSRGraph.from_edges(edges, n_nodes=120)

    emb_local, m_local = train_node_embeddings(csr, epochs=5, seed=0,
                                               hidden=16, out_dim=8)
    mesh = make_device_mesh(n_data=4, n_node=2)
    emb_mesh, m_mesh = train_node_embeddings(csr, epochs=5, seed=0,
                                             hidden=16, out_dim=8, mesh=mesh)
    np.testing.assert_allclose(emb_local, emb_mesh, atol=2e-4, rtol=1e-4)
    assert abs(m_local["final_loss"] - m_mesh["final_loss"]) < 1e-4

    # the aggregation itself must lower to a collective when edges shard
    n = csr.n_nodes
    src = np.concatenate([np.full(len(csr.neighbors(v)), v - 1, np.int32)
                          for v in range(1, n + 1)])
    dst = np.concatenate([csr.neighbors(v) - 1 for v in range(1, n + 1)]
                         ).astype(np.int32)
    pad = (-len(src)) % 8
    src = np.concatenate([src, np.zeros(pad, np.int32)])
    dst = np.concatenate([dst, np.full(pad, n, np.int32)])
    edge_sh = NamedSharding(mesh, P(("data", "node")))
    rep = NamedSharding(mesh, P())
    x = jax.device_put(jnp.eye(n, dtype=jnp.float32), rep)
    src_j = jax.device_put(jnp.asarray(src), edge_sh)
    dst_j = jax.device_put(jnp.asarray(dst), edge_sh)

    @jax.jit
    def agg(x, s, d):
        return jax.ops.segment_sum(x[s], d, num_segments=n)

    hlo = agg.lower(x, src_j, dst_j).compile().as_text()
    assert any(op in hlo for op in
               ("all-reduce", "all-gather", "all-to-all",
                "collective-permute")), \
        "edge-sharded segment_sum compiled without any collective"


def test_mesh_resume_reproduces_uninterrupted_run(tmp_path):
    """Exact elastic resume THROUGH the mesh path: a sharded run
    checkpointed at epoch 2 and resumed for epochs 2-3 reproduces the
    uninterrupted sharded 4-epoch trajectory (exercises re-placing the
    restored numpy opt_state onto the mesh in _shard_params_opt)."""
    import __graft_entry__ as ge
    from subgnn_tpu.train.loop import Trainer
    from subgnn_tpu.train.checkpoint import save_checkpoint

    mesh_axes = dict(mesh_data_axis=4, mesh_node_axis=2)

    def build(max_epochs):
        return ge._build_training_fixture(
            n_train=16, n_val=8,
            hp_overrides=dict(batch_size=8, max_epochs=max_epochs,
                              trainable_cc=True, **mesh_axes))

    model, hp4, params, state, data, anchors, eval_cc = build(4)
    t_full = Trainer(model, hp4, eval_cc_tables=eval_cc)
    t_full.fit(params, state, data["train"], data["val"], anchors,
               seed=0, log_fn=None)

    t_a = Trainer(model, hp4.replace(max_epochs=2), eval_cc_tables=eval_cc)
    t_a.fit(params, state, data["train"], data["val"], anchors,
            seed=0, log_fn=None)
    ckpt = tmp_path / "mid.ckpt"
    save_checkpoint(ckpt, t_a.params, t_a.state, t_a.opt_state,
                    meta={"epoch": 1, "global_step": t_a.global_step})

    t_b = Trainer(model, hp4, eval_cc_tables=eval_cc)
    start = t_b.resume_from(ckpt)
    assert start == 2
    t_b.fit(params, state, data["train"], data["val"], anchors,
            seed=0, log_fn=None, start_epoch=start)

    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(t_full.params),
            jax.tree_util.tree_leaves_with_path(t_b.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))
    assert [m["epoch"] for m in t_b.metric_scores] == [2, 3]


def test_ring_collectives_match_psum():
    """Explicit ring all-reduce / all-gather (parallel/collectives.py)
    agree with lax.psum / lax.all_gather on the virtual 8-device mesh —
    the correctness gate for the ICI A/B harness
    (scripts/bench_ring_collectives.py)."""
    from jax import lax
    from jax.sharding import Mesh
    from subgnn_tpu.parallel.collectives import (
        ring_all_reduce, ring_all_gather, ring_all_reduce_fused)

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("r",))
    n = len(devs)
    rng = np.random.default_rng(0)
    # deliberately NOT divisible by n (exercises the pad path) + a 2-D
    # shape like a weight matrix
    for shape in ((n, 13), (n, 5, 7)):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))

        def ar(xs):
            return ring_all_reduce(xs, "r")

        got = jax.jit(jax.shard_map(ar, mesh=mesh, in_specs=P("r"),
                                    out_specs=P("r")))(x)
        want = jax.jit(jax.shard_map(lambda xs: lax.psum(xs, "r"),
                                     mesh=mesh, in_specs=P("r"),
                                     out_specs=P("r")))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))

    def ag(xs):
        return ring_all_gather(xs.reshape(-1), "r").reshape(-1)

    got = jax.jit(jax.shard_map(ag, mesh=mesh, in_specs=P("r"),
                                out_specs=P("r")))(x)
    want = jax.jit(jax.shard_map(
        lambda xs: lax.all_gather(xs.reshape(-1), "r").reshape(-1),
        mesh=mesh, in_specs=P("r"), out_specs=P("r")))(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # fused variant: chunk_fn applied to every reduced element exactly
    # once == elementwise transform of the psum
    x = jnp.asarray(rng.normal(size=(n, 13)).astype(np.float32))

    def arf(xs):
        return ring_all_reduce_fused(xs, "r", lambda c: 2.0 * c + 1.0)

    got = jax.jit(jax.shard_map(arf, mesh=mesh, in_specs=P("r"),
                                out_specs=P("r")))(x)
    want = jax.jit(jax.shard_map(
        lambda xs: 2.0 * lax.psum(xs, "r") + 1.0,
        mesh=mesh, in_specs=P("r"), out_specs=P("r")))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dtw_pallas_under_shard_map_matches_scan():
    """The mesh-distributed DTW path wraps the kernel in shard_map — the
    Pallas kernel (Mosaic custom call) CANNOT be auto-partitioned by
    GSPMD, so this exact combination (sharded pair axis + Pallas, the one
    a real multi-chip TPU runs) is pinned here in interpret mode against
    the lax.scan kernel."""
    import functools
    from jax import lax  # noqa: F401
    from jax.sharding import Mesh
    from subgnn_tpu.precompute.dtw import dtw_distance_batch
    from subgnn_tpu.ops.dtw_pallas import dtw_distance_pallas

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("r",))
    n = 8 * len(devs)            # kernel needs per-device N % 8 == 0
    rng = np.random.default_rng(3)
    La, Lb = 12, 10
    a = np.zeros((n, La), np.float32)
    b = np.zeros((n, Lb), np.float32)
    la = rng.integers(0, La + 1, n).astype(np.int32)  # incl. empty rows
    lb = rng.integers(1, Lb + 1, n).astype(np.int32)
    for i in range(n):
        a[i, :la[i]] = np.sort(rng.integers(1, 20, la[i]))[::-1]
        b[i, :lb[i]] = np.sort(rng.integers(1, 20, lb[i]))[::-1]

    kern = functools.partial(dtw_distance_pallas, interpret=True)
    spec = P("r")
    f = jax.jit(jax.shard_map(kern, mesh=mesh,
                              in_specs=(spec, spec, spec, spec),
                              out_specs=spec, check_vma=False))
    got = np.asarray(f(a, la, b, lb))
    want = np.asarray(dtw_distance_batch(
        jnp.asarray(a), jnp.asarray(la), jnp.asarray(b), jnp.asarray(lb)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dryrun_multichip_full_at_scale(tmp_path):
    """The at-scale multichip dryrun (VERDICT r3 task 7): sharded
    precompute -> fused fit -> eval -> checkpoint in ONE invocation on a
    5k-node instance over the 8-device virtual mesh, with the GSPMD
    collective audit asserting per-op counts and byte volumes."""
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    res = ge.dryrun_multichip_full(8, workdir=tmp_path)
    assert res["mesh"] == {"data": 4, "node": 2}
    assert res["n_nodes"] == 5000
    # grads reduce over 'data', node-sharded anchor gathers psum over
    # 'node' (the collectives_report.py accounting: 3 all-reduces at 4x2)
    assert res["collective_counts"].get("all-reduce", 0) == 3, res
    assert res["collective_bytes"]["all-reduce"] > 4_000_000, res
