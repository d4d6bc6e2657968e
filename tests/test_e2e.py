"""End-to-end: synthetic DENSITY dataset -> node embeddings -> full pipeline."""
import numpy as np
import pytest

from subgnn_tpu.config import HParams, RunConfig
from subgnn_tpu.data.graph import CSRGraph
from subgnn_tpu.prepare.synthetic import build_synthetic_dataset
from subgnn_tpu.prepare.node_emb import train_node_embeddings, save_embeddings
from subgnn_tpu.train.runner import SubGNNPipeline


@pytest.fixture(scope="module")
def density_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    task_dir = root / "density"
    builder = build_synthetic_dataset(
        task_dir, desired_property="density", seed=42,
        n=120, m=3, n_subgraphs=40, n_subgraph_nodes=8, max_tries=40)
    graph = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    emb, metrics = train_node_embeddings(graph, conv_type="gin", hidden=32,
                                         out_dim=16, epochs=30, seed=0)
    save_embeddings(task_dir, emb, "gin")
    return root, task_dir, builder, metrics


def test_synthetic_dataset_files(density_dataset):
    root, task_dir, builder, _ = density_dataset
    assert (task_dir / "edge_list.txt").exists()
    assert (task_dir / "subgraphs.pth").exists()
    lines = (task_dir / "subgraphs.pth").read_text().strip().split("\n")
    assert len(lines) >= 30
    splits = [l.split("\t")[2] for l in lines]
    assert splits.count("train") > splits.count("val") > 0
    labels = {l.split("\t")[1] for l in lines}
    assert len(labels) >= 2  # quantile binning made >= 2 classes


def test_node_embeddings_learn_link_structure(density_dataset):
    _, _, _, metrics = density_dataset
    assert metrics["val_auc"] > 0.6, metrics


def test_full_pipeline_density(density_dataset, tmp_path):
    root, task_dir, _, _ = density_dataset
    rc = RunConfig(task="density", project_root=root)
    hp = HParams(
        use_neighborhood=True, use_structure=True, use_position=True,
        n_layers=1, max_epochs=4, batch_size=16, learning_rate=3e-3,
        n_anchor_patches_N_in=3, n_anchor_patches_N_out=4,
        n_anchor_patches_pos_in=4, n_anchor_patches_pos_out=6,
        n_anchor_patches_structure=4, n_triangular_walks=3,
        random_walk_len=6, sample_walk_len=10, max_sim_epochs=2,
        linear_hidden_dim_1=16, linear_hidden_dim_2=8, seed=0,
        embedding_type="gin", grad_clip=0.5)
    pipe = SubGNNPipeline(rc, hp, results_dir=tmp_path)
    out = pipe.run(log_fn=None)
    assert "val_micro_f1" in out["val"]
    assert "test_micro_f1" in out["test"]
    assert 0.0 <= out["test"]["test_micro_f1"] <= 1.0
    assert (tmp_path / "hyperparams.json").exists()
    assert (tmp_path / "final_metric_scores.json").exists()
    assert (tmp_path / "test_results.json").exists()
    # trainer_kwargs.json sidecar with the reference's serializable keys
    # (reference: train_config.py:121-131,179-183)
    import json
    tkw = json.loads((tmp_path / "trainer_kwargs.json").read_text())
    assert tkw["max_epochs"] == hp.max_epochs
    assert tkw["gradient_clip_val"] == hp.grad_clip
    assert tkw["num_sanity_val_steps"] == 0
    assert "devices" in tkw and len(tkw["devices"]) >= 1
    assert list((tmp_path / "checkpoints").glob("*.ckpt"))
    # caches were produced with reference-compatible names
    sims = rc.similarities_path()
    assert list(sims.glob("0_train_similarities.npy"))
    assert list(sims.glob("struc_patches_*.npy"))
    # second run hits the caches and restores from the same artifacts
    losses = [m["train_loss"] for m in pipe.trainer.metric_scores]
    assert losses[-1] < losses[0]


def test_pipeline_structure_only(density_dataset, tmp_path):
    """The hpo_metab best-hparams shape: S channel only."""
    root, task_dir, _, _ = density_dataset
    rc = RunConfig(task="density", project_root=root)
    hp = HParams(
        use_neighborhood=False, use_structure=True, use_position=False,
        n_layers=2, max_epochs=2, batch_size=16,
        n_anchor_patches_structure=4, n_triangular_walks=3,
        random_walk_len=6, sample_walk_len=10, max_sim_epochs=2,
        linear_hidden_dim_1=16, linear_hidden_dim_2=8, seed=1,
        embedding_type="gin")
    pipe = SubGNNPipeline(rc, hp, results_dir=tmp_path)
    out = pipe.run(log_fn=None)
    assert 0.0 <= out["test"]["test_acc"] <= 1.0


def test_full_pipeline_multilabel(density_dataset, tmp_path):
    """Exercise the multilabel path end-to-end (HPO-NEURO-shaped data):
    rewrite the density TSV with 1-2 dash-joined labels per subgraph."""
    root, task_dir, _, _ = density_dataset
    import shutil
    ml_dir = root / "density_ml"
    ml_dir.mkdir(exist_ok=True)
    for f in ("edge_list.txt", "gin_embeddings.npy", "gin_embeddings.pth",
              "shortest_path_matrix.npy"):
        src = task_dir / f
        if src.exists():
            shutil.copy(src, ml_dir / f)
    rng = np.random.default_rng(0)
    lines = (task_dir / "subgraphs.pth").read_text().strip().split("\n")
    with open(ml_dir / "subgraphs.pth", "w") as fout:
        for line in lines:
            nodes, label, split = line.split("\t")[:3]
            labels = label if rng.random() < 0.5 else label + "-X"
            fout.write(f"{nodes}\t{labels}\t{split}\n")

    rc = RunConfig(task="density_ml", project_root=root)
    hp = HParams(
        use_neighborhood=False, use_structure=True, use_position=False,
        n_layers=1, max_epochs=3, batch_size=8,
        n_anchor_patches_structure=3, n_triangular_walks=2,
        random_walk_len=5, sample_walk_len=8, max_sim_epochs=2,
        linear_hidden_dim_1=8, linear_hidden_dim_2=8, seed=0,
        embedding_type="gin")
    pipe = SubGNNPipeline(rc, hp, results_dir=tmp_path)
    out = pipe.run(log_fn=None)
    assert pipe.multilabel
    t = out["test"]
    assert 0.0 <= t["test_micro_f1"] <= 1.0
    assert "test_auroc_class_0" in t


def test_subset_data_flag(density_dataset, tmp_path):
    root, task_dir, _, _ = density_dataset
    rc = RunConfig(task="density", project_root=root)
    hp = HParams(use_neighborhood=False, use_structure=True,
                 use_position=False, n_layers=1, max_epochs=1, batch_size=4,
                 subset_data=True, n_anchor_patches_structure=3,
                 n_triangular_walks=2, random_walk_len=5, sample_walk_len=8,
                 max_sim_epochs=2, linear_hidden_dim_1=8,
                 linear_hidden_dim_2=8, embedding_type="gin")
    pipe = SubGNNPipeline(rc, hp, results_dir=tmp_path)
    pipe.load()
    assert len(pipe.subgraphs["train"]) <= 4
    assert len(pipe.subgraphs["val"]) <= 4


def test_ego_graph_patch_type(density_dataset, tmp_path):
    root, task_dir, _, _ = density_dataset
    rc = RunConfig(task="density", project_root=root)
    hp = HParams(use_neighborhood=False, use_structure=True,
                 use_position=False, n_layers=1, max_epochs=1, batch_size=8,
                 structure_patch_type="ego_graph",
                 structure_anchor_patch_radius=1,
                 n_anchor_patches_structure=3, n_triangular_walks=2,
                 random_walk_len=5, max_sim_epochs=2,
                 linear_hidden_dim_1=8, linear_hidden_dim_2=8,
                 embedding_type="gin")
    pipe = SubGNNPipeline(rc, hp, results_dir=tmp_path)
    out = pipe.run(log_fn=None)
    assert 0.0 <= out["test"]["test_acc"] <= 1.0


def test_edit_distance_raises(density_dataset, tmp_path):
    root, task_dir, _, _ = density_dataset
    rc = RunConfig(task="density", project_root=root)
    hp = HParams(use_neighborhood=False, use_structure=True,
                 use_position=False, structure_similarity_fn="edit_distance",
                 embedding_type="gin")
    pipe = SubGNNPipeline(rc, hp)
    pipe.load()
    with pytest.raises(NotImplementedError):
        pipe.precompute()


def test_run_determinism(density_dataset, tmp_path):
    """Same seed twice -> identical metrics (full-run reproducibility, the
    reference's determinism-controls analog, SURVEY §4)."""
    root, task_dir, _, _ = density_dataset
    rc = RunConfig(task="density", project_root=root)
    hp = HParams(use_neighborhood=False, use_structure=True,
                 use_position=False, n_layers=1, max_epochs=3, batch_size=8,
                 n_anchor_patches_structure=3, n_triangular_walks=2,
                 random_walk_len=5, sample_walk_len=8, max_sim_epochs=2,
                 linear_hidden_dim_1=8, linear_hidden_dim_2=8, seed=7,
                 embedding_type="gin")
    outs = []
    for i in range(2):
        pipe = SubGNNPipeline(rc, hp, results_dir=tmp_path / str(i))
        outs.append(pipe.run(log_fn=None))
    assert outs[0]["test"]["test_micro_f1"] == outs[1]["test"]["test_micro_f1"]
    assert abs(outs[0]["test"]["test_loss"] - outs[1]["test"]["test_loss"]) < 1e-5


def test_pipeline_trainable_cc(density_dataset, tmp_path):
    """trainable_cc end-to-end: train-split CC tables are parameters; val
    and test use tables frozen at the pretrained-embedding init
    (reference: SubGNN.py:646-668)."""
    root, task_dir, _, _ = density_dataset
    rc = RunConfig(task="density", project_root=root)
    # the N channel is the one whose updated CC embeddings reach the
    # readout, so its trainable tables receive gradient (S/P tables are
    # structurally gradient-free, as in the reference)
    hp = HParams(use_neighborhood=True, use_structure=False,
                 use_position=False, n_layers=1, max_epochs=3, batch_size=8,
                 trainable_cc=True, n_anchor_patches_N_in=3,
                 n_anchor_patches_N_out=4, neigh_sample_border_size=1,
                 linear_hidden_dim_1=8,
                 linear_hidden_dim_2=8, seed=0, embedding_type="gin",
                 learning_rate=5e-3)
    pipe = SubGNNPipeline(rc, hp, results_dir=tmp_path)
    out = pipe.run(log_fn=None)
    trainer = pipe.trainer
    assert "train_cc" in trainer.params
    # train CC tables moved from their init; val tables did not
    init = pipe._init_cc_tables("train")["N_I"]
    moved = np.abs(np.asarray(trainer.params["train_cc"]["N_I"]) - init).max()
    assert moved > 0
    assert 0.0 <= out["test"]["test_acc"] <= 1.0


def test_node_emb_gcn_variant(density_dataset):
    """GCN conv variant of the pretrainer also learns link structure."""
    from subgnn_tpu.prepare.node_emb import train_node_embeddings
    from subgnn_tpu.data.graph import CSRGraph
    root, task_dir, _, _ = density_dataset
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    emb, metrics = train_node_embeddings(g, conv_type="gcn", hidden=32,
                                         out_dim=16, epochs=30, seed=0)
    assert emb.shape == (g.n_nodes, 16)
    assert metrics["val_auc"] > 0.6, metrics


def test_node_emb_graphsaint_minibatch(density_dataset):
    """GraphSAINT-style device-walk minibatching learns link structure at
    least as well as a few full-batch epochs would (VERDICT item 7)."""
    from subgnn_tpu.prepare.node_emb import train_node_embeddings
    from subgnn_tpu.data.graph import CSRGraph
    root, task_dir, _, _ = density_dataset
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    emb, metrics = train_node_embeddings(
        g, conv_type="gin", hidden=32, out_dim=16, epochs=6, seed=0,
        minibatch="graphsaint", batch_size=16, walk_length=8, num_steps=4)
    assert emb.shape == (g.n_nodes, 16)
    assert metrics["val_auc"] > 0.6, metrics


def test_saint_dispatch_epochs_work_calibrated():
    """Fused GraphSAINT dispatches are sized by deterministic edge-step
    work: the axon worker kills ~80s single dispatches at EM-USER scale
    while memory stays fine (scripts/diag_emuser_emb.py, round 4)."""
    from subgnn_tpu.prepare.node_emb import (EPOCH_DISPATCH_CHUNK,
                                             saint_dispatch_epochs)
    # small graphs keep the historical 10-epoch dispatches
    assert saint_dispatch_epochs(8, 100_000) == EPOCH_DISPATCH_CHUNK
    assert saint_dispatch_epochs(32, 600_000) == EPOCH_DISPATCH_CHUNK
    # EM-USER shapes (9.17M directed edges, num_steps=8): 200M edge-steps
    # per dispatch = 2 epochs (~16s measured, vs the 10-epoch kill)
    assert saint_dispatch_epochs(8, 9_166_800) == 2
    # never zero, even beyond the budget
    assert saint_dispatch_epochs(32, 50_000_000) == 1


def test_saint_fold_points_byte_stability_contract():
    """The 200M edge-step budget is part of the byte-stability contract:
    chunk boundaries are the rng fold points (fold_in(key, e0)), so a
    budget tweak silently changes every embedding draw on graphs above
    ~2.5M directed edges. Pin the fold sequences for the large-graph
    regimes so such a change fails HERE, loudly, instead."""
    from subgnn_tpu.prepare.node_emb import saint_dispatch_epochs

    def fold_points(epochs, num_steps, n_edges):
        c = saint_dispatch_epochs(num_steps, n_edges)
        return list(range(0, epochs, c))

    # EM-USER regime (57k nodes / 9.17M directed edges, num_steps=8,
    # 10 emb epochs): chunk 2 -> folds at 0,2,4,6,8
    assert fold_points(10, 8, 9_166_800) == [0, 2, 4, 6, 8]
    # mid regime just past the 2.5M threshold: chunk 5 -> folds 0,5
    assert fold_points(10, 8, 4_580_000) == [0, 5]
    # below threshold the historical single-dispatch draw is preserved
    assert fold_points(10, 8, 2_400_000) == [0]


def test_node_emb_neighbor_minibatch(density_dataset):
    """The reference's third minibatch mode (PyG NeighborSampler,
    train_node_emb.py:52-53): per-epoch shuffled seed batches, training on
    the seeds' incoming edges, learns link structure (VERDICT r2 task 4)."""
    from subgnn_tpu.prepare.node_emb import train_node_embeddings
    from subgnn_tpu.data.graph import CSRGraph
    root, task_dir, _, _ = density_dataset
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    emb, metrics = train_node_embeddings(
        g, conv_type="gin", hidden=32, out_dim=16, epochs=6, seed=0,
        minibatch="neighbor", batch_size=16)
    assert emb.shape == (g.n_nodes, 16)
    assert metrics["val_auc"] > 0.6, metrics


def test_node_emb_neighbor_nb_size_thinning(density_dataset):
    """nb_size>0 (the reference's NB_SIZE fan-in budget,
    config_prepare_dataset.py:52) thins each seed's in-edges i.i.d. at
    rate nb_size/deg — the documented static-shape deviation. The thinned
    run must still learn link structure, and the knob is reachable through
    prepare()'s emb_nb_size (cli/prepare_dataset.py)."""
    import inspect
    from subgnn_tpu.cli.prepare_dataset import prepare
    from subgnn_tpu.prepare.node_emb import train_node_embeddings
    from subgnn_tpu.data.graph import CSRGraph
    root, task_dir, _, _ = density_dataset
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    emb, metrics = train_node_embeddings(
        g, conv_type="gin", hidden=32, out_dim=16, epochs=6, seed=0,
        minibatch="neighbor", batch_size=16, nb_size=2)
    assert emb.shape == (g.n_nodes, 16)
    assert metrics["val_auc"] > 0.6, metrics
    assert "emb_nb_size" in inspect.signature(prepare).parameters


def test_train_holdout_nested_selection(density_dataset, tmp_path):
    """train_holdout carves rows OUT of fit and scores them with the
    restored best-val checkpoint — the nested-model-selection objective
    for HPO (round-4 fix: best-val saturates identically for every
    channel subset on tiny val splits while test scores diverge). Covers
    the trainable_cc path (holdout gets PRETRAINED-init CC tables like a
    non-train split) and checks a different holdout changes nothing about
    the val/test protocol."""
    root, task_dir, _, _ = density_dataset
    rc = RunConfig(task="density", project_root=root)
    hp = HParams(
        use_neighborhood=True, use_structure=True, use_position=False,
        n_layers=1, max_epochs=3, batch_size=8, learning_rate=3e-3,
        n_anchor_patches_N_in=3, n_anchor_patches_N_out=4,
        n_anchor_patches_structure=4, n_triangular_walks=3,
        random_walk_len=6, sample_walk_len=10, max_sim_epochs=2,
        linear_hidden_dim_1=16, linear_hidden_dim_2=8, seed=0,
        embedding_type="gin", trainable_cc=True)
    H = np.array([1, 4, 7, 9])
    pipe = SubGNNPipeline(rc, hp, train_holdout=H)
    out = pipe.run(log_fn=None)
    hm = out["holdout"]
    assert hm is not None and "holdout_micro_f1" in hm, hm
    assert 0.0 <= hm["holdout_micro_f1"] <= 1.0
    assert np.isfinite(hm["holdout_loss"])
    # the trainable train-CC table shrank to the kept rows
    n_train = len(pipe.subgraphs["train"])
    assert pipe.trainer.params["train_cc"]["N_I"].shape[0] == n_train - len(H)
    # val/test protocol still runs and reports as usual
    assert "test_micro_f1" in out["test"]
    # no holdout -> key present but None
    out2 = SubGNNPipeline(rc, hp).run(log_fn=None)
    assert out2["holdout"] is None


def test_node_emb_neighbor_exact_k(density_dataset):
    """nb_exact=True keeps exactly min(nb_size, in_degree) incoming edges
    per node, uniformly without replacement — the reference NeighborSampler
    distribution (preprocess.py:87-106 sizes=[nb_size]); resolves the
    PARITY #13 deviation. Checks the mask is 0/1 with exact per-node
    counts, the marginal inclusion frequency is uniform at min(k,deg)/deg,
    and a trained exact-k run still learns link structure."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from subgnn_tpu.prepare.node_emb import (build_in_edge_table,
                                             exact_k_edge_mask,
                                             train_node_embeddings)
    from subgnn_tpu.data.graph import CSRGraph
    root, task_dir, _, _ = density_dataset
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    n = g.n_nodes
    counts = np.diff(g.indptr[1:]).astype(np.int64)
    src = np.repeat(np.arange(n, dtype=np.int32), counts)
    dst = (g.indices[g.indptr[1]:] - 1).astype(np.int32)
    E = len(dst)
    k = 3
    in_pos, in_valid = build_in_edge_table(dst, n)
    indeg = np.bincount(dst, minlength=n)

    # exact per-node counts, 0/1 mask, no replacement
    mask = np.asarray(exact_k_edge_mask(jax.random.PRNGKey(0),
                                        jnp.asarray(in_pos),
                                        jnp.asarray(in_valid), k, E))
    assert set(np.unique(mask)) <= {0.0, 1.0}
    per_dst = np.bincount(dst, weights=mask, minlength=n)
    np.testing.assert_array_equal(per_dst, np.minimum(k, indeg))

    # uniform marginal: every in-edge of a node is kept with the same
    # frequency min(k, deg)/deg
    n_draws = 300
    keys = jax.random.split(jax.random.PRNGKey(1), n_draws)
    freq = np.asarray(jax.vmap(
        lambda kk: exact_k_edge_mask(kk, jnp.asarray(in_pos),
                                     jnp.asarray(in_valid), k, E)
    )(keys)).mean(axis=0)
    expect = np.minimum(k, indeg)[dst] / np.maximum(indeg[dst], 1)
    assert np.abs(freq - expect).max() < 0.12, \
        np.abs(freq - expect).max()

    emb, metrics = train_node_embeddings(
        g, conv_type="gin", hidden=32, out_dim=16, epochs=6, seed=0,
        minibatch="neighbor", batch_size=16, nb_size=2, nb_exact=True)
    assert emb.shape == (g.n_nodes, 16)
    assert metrics["val_auc"] > 0.6, metrics


def test_node_emb_edge_mask_semantics(density_dataset):
    """The NeighborSampler edge-mask formulation matches the reference's
    bipartite sampled graph (preprocess.py:87-106): an all-ones mask is the
    full forward (every node a seed, nb_size=-1 keeps all in-edges), and a
    masked-out destination keeps only its self term in layer 1."""
    import jax.numpy as jnp
    import numpy as np
    from subgnn_tpu.prepare.node_emb import gnn_forward, init_gnn_params
    import jax

    # tiny graph: 0-1, 1-2 (directed both ways)
    src = jnp.array([0, 1, 1, 2], jnp.int32)
    dst = jnp.array([1, 0, 2, 1], jnp.int32)
    n = 3
    deg = jnp.array([1.0, 2.0, 1.0])
    x = jnp.eye(n)
    params = init_gnn_params(jax.random.PRNGKey(0), n, 8, 4)
    for conv in ("gin", "gcn"):
        full = gnn_forward(params, x, src, dst, n, conv, deg)
        ones = gnn_forward(params, x, src, dst, n, conv, deg,
                           edge_mask=jnp.ones(4))
        np.testing.assert_allclose(np.asarray(full), np.asarray(ones),
                                   rtol=1e-6)
    # seeds = {0}: only the edge 1->0 carries; node 2's GIN layer-1
    # pre-activation is its bare self feature projected
    emask = jnp.array([0.0, 1.0, 0.0, 0.0])
    out = gnn_forward(params, x, src, dst, n, "gin", deg, edge_mask=emask)
    w1, b1 = params["conv1"]["w"], params["conv1"]["b"]
    w2, b2 = params["conv2"]["w"], params["conv2"]["b"]
    h2 = jax.nn.relu(x[2] @ w1 + b1)
    np.testing.assert_allclose(np.asarray(out[2]),
                               np.asarray(h2 @ w2 + b2), rtol=1e-6)


def test_node_emb_greedy_search(density_dataset, monkeypatch):
    """Greedy coordinate descent sweeps every value of every type and
    returns the best-val-acc configuration (train_node_emb.py:146-172);
    configurations already evaluated (later coordinates revisiting the
    settled incumbent) are skipped, not retrained."""
    import subgnn_tpu.prepare.node_emb as ne
    from subgnn_tpu.data.graph import CSRGraph
    root, task_dir, _, _ = density_dataset
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    monkeypatch.setattr(ne, "SEARCH_SPACES", {
        "hidden": [16, 32], "out_dim": [8], "lr": [0.005],
        "weight_decay": [5e-4], "dropout": [0.4],
        "batch_size": [16], "walk_length": [8], "num_steps": [4]})
    seen = []
    emb, metrics, best_hp = ne.greedy_hyperparam_search(
        g, conv_type="gin", minibatch="full", epochs=8, seed=1,
        log_fn=seen.append)
    # only 2 UNIQUE configs exist (hidden 16 vs 32 with all-single-value
    # other coordinates): exactly 2 trainings, no redundant repeats
    assert len(seen) == 2
    assert best_hp["hidden"] in (16, 32)
    assert emb.shape == (g.n_nodes, 8)
    assert metrics["val_acc"] >= 0.5


def test_node_emb_plot_artifacts(density_dataset, tmp_path):
    from subgnn_tpu.prepare.node_emb import train_node_embeddings
    from subgnn_tpu.data.graph import CSRGraph
    _, task_dir, _, _ = density_dataset
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    train_node_embeddings(g, conv_type="gin", hidden=16, out_dim=8,
                          epochs=4, seed=0, plots_dir=tmp_path)
    assert (tmp_path / "gin_loss_curve.png").exists()
    assert (tmp_path / "gin_roc_curve.png").exists()


def test_batch_norm_best_state_restored(density_dataset, tmp_path):
    """Test-time eval must use the BEST checkpoint's batch-norm running
    stats, not the last epoch's (review round-2 fix): after run(), the
    trainer's state equals the best checkpoint's saved state."""
    import jax.tree_util as jtu
    from subgnn_tpu.train.checkpoint import load_checkpoint
    root, task_dir, _, _ = density_dataset
    rc = RunConfig(task="density", project_root=root)
    hp = HParams(
        use_neighborhood=True, use_structure=False, use_position=False,
        n_layers=1, max_epochs=4, batch_size=16, learning_rate=3e-3,
        n_anchor_patches_N_in=3, n_anchor_patches_N_out=4,
        batch_norm=True, linear_hidden_dim_1=16, linear_hidden_dim_2=8,
        seed=0, embedding_type="gin")
    pipe = SubGNNPipeline(rc, hp, results_dir=tmp_path)
    pipe.run(log_fn=None)
    best = pipe.trainer.ckpt.best_path
    assert best is not None
    saved_state = load_checkpoint(best)["state"]
    got = jtu.tree_leaves(pipe.trainer.state)
    want = jtu.tree_leaves(saved_state)
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


def test_chunked_spmm_matches_unchunked(density_dataset):
    """_gather_segment_sum with a tiny chunk must equal the whole-array
    path (values AND grads) — the HBM-bounding path for multi-million-edge
    graphs (round 4: the 6.4M-edge HPO stand-in OOM'd 15.75G HBM with
    whole-array messages)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from subgnn_tpu.prepare.node_emb import gnn_forward, init_gnn_params
    from subgnn_tpu.data.graph import CSRGraph
    root, task_dir, _, _ = density_dataset
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    n = g.n_nodes
    counts = np.diff(g.indptr[1:]).astype(np.int64)
    src = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32), counts))
    dst = jnp.asarray((g.indices[g.indptr[1]:] - 1).astype(np.int32))
    deg = jnp.asarray(g.degrees[1:].astype(np.float32))
    x = jax.random.normal(jax.random.PRNGKey(0), (n, 12))
    params = init_gnn_params(jax.random.PRNGKey(1), 12, 16, 8)
    emask = jnp.asarray(
        (np.random.default_rng(2).random(src.shape[0]) > 0.3)
        .astype(np.float32))
    for conv in ("gin", "gcn"):
        for em in (None, emask):
            def loss(p, chunk):
                return gnn_forward(p, x, src, dst, n, conv, deg,
                                   edge_mask=em, edge_chunk=chunk).sum()
            full_v, full_g = jax.value_and_grad(loss)(params, None)
            ch_v, ch_g = jax.value_and_grad(loss)(params, 37)
            np.testing.assert_allclose(float(full_v), float(ch_v),
                                       rtol=1e-5)
            for a, b in zip(jax.tree_util.tree_leaves(full_g),
                            jax.tree_util.tree_leaves(ch_g)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-4, atol=1e-5)


def test_standin_internal_structure_scores_match_naive():
    """The vectorized boolean-mask membership in make_real_standins must
    equal the naive per-element set-membership formulation (the labels it
    produces are part of the stand-ins' byte-stability contract)."""
    import importlib.util
    from pathlib import Path
    spec = importlib.util.spec_from_file_location(
        "make_real_standins",
        Path(__file__).resolve().parents[1] / "scripts"
        / "make_real_standins.py")
    mrs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mrs)
    rng = np.random.default_rng(0)
    n = 60
    edges = np.array([(i, j) for i in range(n) for j in range(i + 1, n)
                      if rng.random() < 0.2])
    und = np.concatenate([edges, edges[:, ::-1]])
    und = und[np.argsort(und[:, 0], kind="stable")]
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(und[:, 0], minlength=n), out=indptr[1:])
    indices = und[:, 1]
    subs = [rng.choice(n, size=k, replace=False) for k in (3, 7, 12, 5)]
    dens, mean_d, max_d = mrs.internal_structure_scores(indptr, indices,
                                                        subs)
    for i, s in enumerate(subs):
        members = set(int(v) for v in s)
        deg_in = np.array([sum(1 for u in indices[indptr[v]:indptr[v + 1]]
                               if int(u) in members) for v in s])
        k = len(s)
        assert dens[i] == (deg_in.sum() / 2) / (k * (k - 1) / 2)
        assert mean_d[i] == deg_in.mean()
        assert max_d[i] == deg_in.max()
