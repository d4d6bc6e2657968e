"""Release gate: the checked-in miniature dataset in the reference's EXACT
on-disk format (VERDICT round-1 item 4) trains end-to-end through the
canonical config driver.

Covers every file type of the reference path contract
(SubGNN/train_config.py:216-231): edge_list.txt, subgraphs.pth TSV with
'-'-joined MULTILABEL rows and a val split smaller than test (the swap
quirk, subgraph_utils.py:89-90), shortest_path_matrix.npy,
degree_sequence.txt, ego_graphs.txt, torch-saved gin_embeddings.pth, and
the similarities/ cache dir. Regenerate with scripts/make_mini_fixture.py.
"""
import json
import shutil
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "mini_multilabel"


@pytest.fixture()
def mini_root(tmp_path):
    shutil.copytree(FIXTURE / "mini", tmp_path / "mini")
    return tmp_path


def test_fixture_files_are_reference_format():
    import torch
    task = FIXTURE / "mini"
    emb = torch.load(task / "gin_embeddings.pth", map_location="cpu",
                     weights_only=False)
    assert isinstance(emb, torch.Tensor) and emb.shape == (40, 8)
    sp = np.load(task / "shortest_path_matrix.npy")
    assert sp.shape == (40, 40) and sp.dtype.kind in "iu"
    assert np.all(np.diag(sp) == 0)
    ego = json.loads((task / "ego_graphs.txt").read_text())
    deg = json.loads((task / "degree_sequence.txt").read_text())
    assert set(ego) == set(deg) == {str(i) for i in range(40)}
    rows = (task / "subgraphs.pth").read_text().strip().split("\n")
    assert any("-" in r.split("\t")[1] for r in rows)  # multilabel rows
    splits = [r.split("\t")[2] for r in rows]
    assert splits.count("val") < splits.count("test")  # swap quirk trips


def test_multilabel_read_applies_swap_quirk(mini_root):
    from subgnn_tpu.data.subgraphs import read_subgraphs
    tr, trl, va, val, te, tel, multilabel = read_subgraphs(
        mini_root / "mini" / "subgraphs.pth")
    assert multilabel
    # file had 2 val / 4 test; reader swaps so val is the larger split
    assert len(va) == 4 and len(te) == 2


def test_train_config_runs_on_reference_format_fixture(mini_root):
    from subgnn_tpu.cli.train_config import run_study
    study = run_study(str(FIXTURE / "mini_config.json"),
                      project_root=str(mini_root), log_fn=None)
    best = study.best_trial
    assert best is not None and 0.0 <= best["value"] <= 1.0
    # the run exercised the precompute cache dir + multilabel BCE path
    sim_dir = mini_root / "mini" / "similarities"
    assert any(sim_dir.glob("*_similarities.npy"))


def test_precompute_row_subset_path_matches_full(mini_root, monkeypatch):
    """Above _FULL_SP_MAX_NODES the pipeline must never materialize the
    (n, n) all-pairs matrix: NP sims come from BFS rows at CC sources only
    (shortest_path_rows) and must be bit-identical to the full-matrix
    result."""
    from subgnn_tpu.config import HParams, RunConfig
    from subgnn_tpu.train import runner as runner_mod
    from subgnn_tpu.train.runner import SubGNNPipeline

    hp = HParams(max_epochs=0, use_structure=False, max_sim_epochs=1)

    def run(root, tag):
        rc = RunConfig(task="mini", project_root=root)
        pipe = SubGNNPipeline(rc, hp)
        pipe.load()
        pipe.precompute()
        return pipe

    full = run(mini_root, "full")

    import shutil
    rows_root = mini_root / "rows"
    shutil.copytree(mini_root / "mini", rows_root / "mini")
    (rows_root / "mini" / "shortest_path_matrix.npy").unlink()
    shutil.rmtree(rows_root / "mini" / "similarities")
    monkeypatch.setattr(runner_mod, "_FULL_SP_MAX_NODES", 10)  # graph is 40
    rows = run(rows_root, "rows")

    for s in ("train", "val", "test"):
        np.testing.assert_array_equal(full.np_sim[s], rows.np_sim[s])
    # the n^2 artifact must NOT have been rebuilt on the rows path
    assert not (rows_root / "mini" / "shortest_path_matrix.npy").exists()


def test_predict_serves_new_subgraphs(mini_root):
    """Serving path: predict() classifies subgraph node lists directly.
    (1) Given the same anchors, predicting the test split's node lists
    reproduces the test-eval accuracy exactly (the on-the-fly precompute
    — rows-path NP sims, fresh border sets, DTW vs the persisted pool —
    is bit-equivalent to the cached split artifacts). (2) Novel node
    lists get deterministic, well-formed outputs."""
    from subgnn_tpu.config import HParams, RunConfig
    from subgnn_tpu.train.runner import SubGNNPipeline
    from subgnn_tpu.train import metrics as M

    rc = RunConfig(task="mini", project_root=mini_root)
    hp = HParams(max_epochs=3, use_neighborhood=True, use_position=True,
                 use_structure=True, max_sim_epochs=1, n_triangular_walks=2,
                 random_walk_len=4, sample_walk_len=6, batch_size=4,
                 n_layers=1, node_embed_size=8, linear_hidden_dim_1=8,
                 linear_hidden_dim_2=8, n_anchor_patches_N_in=2,
                 n_anchor_patches_N_out=2, n_anchor_patches_pos_in=3,
                 n_anchor_patches_pos_out=3, n_anchor_patches_structure=2,
                 seed=0)
    pipe = SubGNNPipeline(rc, hp)
    out = pipe.run(log_fn=None)

    test_anchors = pipe.sample_anchors(hp.seed)["test"]
    res = pipe.predict(pipe.subgraphs["test"], anchors=test_anchors)
    labels = pipe.split_data("test").labels
    acc = M.calc_accuracy(res["logits"], labels, pipe.multilabel)
    assert np.isclose(acc, out["test"]["test_acc"])

    novel = [[1, 5, 9, 13], [2, 6, 10], [30, 31, 32, 33, 34]]
    r1 = pipe.predict(novel)
    r2 = pipe.predict(novel)
    assert r1["logits"].shape == (3, res["logits"].shape[1])
    np.testing.assert_array_equal(r1["logits"], r2["logits"])
    assert r1["probs"].min() >= 0.0 and r1["probs"].max() <= 1.0


def test_predict_cli_roundtrip(mini_root, tmp_path):
    """The serving CLI restores a trained run's best checkpoint and
    classifies node lists from a '-'-joined file."""
    from subgnn_tpu.config import HParams, RunConfig
    from subgnn_tpu.train.runner import SubGNNPipeline
    from subgnn_tpu.cli.predict import main as predict_main

    rc = RunConfig(task="mini", project_root=mini_root)
    hp = HParams(max_epochs=3, use_neighborhood=True, use_position=False,
                 use_structure=False, batch_size=4, n_layers=1,
                 node_embed_size=8, linear_hidden_dim_1=8,
                 linear_hidden_dim_2=8, n_anchor_patches_N_in=2,
                 n_anchor_patches_N_out=2, seed=0)
    results = tmp_path / "run"
    SubGNNPipeline(rc, hp, results_dir=results).run(log_fn=None)

    sub_file = tmp_path / "new.txt"
    sub_file.write_text("1-5-9\n2-6-10-14\n")
    out_file = tmp_path / "pred.json"
    predict_main(["-task", "mini", "-project_root", str(mini_root),
                  "-restoreModelPath", str(results),
                  "-subgraphs", str(sub_file), "-out", str(out_file)])
    out = json.loads(out_file.read_text())
    assert len(out["pred"]) == 2
    assert out["classes"]  # mini fixture is multilabel
    assert "val_micro_f1" in out["checkpoint"]


def test_predict_pad_bounds_pin_shapes(mini_root):
    """max_n_cc/max_len_cc pin the padded CC shape so same-bound serving
    calls never retrace; results equal the unpinned call."""
    from subgnn_tpu.config import HParams, RunConfig
    from subgnn_tpu.train.runner import SubGNNPipeline

    rc = RunConfig(task="mini", project_root=mini_root)
    hp = HParams(max_epochs=1, use_neighborhood=True, use_position=False,
                 use_structure=False, batch_size=4, n_layers=1,
                 node_embed_size=8, linear_hidden_dim_1=8,
                 linear_hidden_dim_2=8, n_anchor_patches_N_in=2,
                 n_anchor_patches_N_out=2, seed=0)
    pipe = SubGNNPipeline(rc, hp)
    pipe.run(log_fn=None)
    novel = [[1, 5, 9], [2, 6]]
    r1 = pipe.predict(novel, max_n_cc=4, max_len_cc=6)
    # same bounds + same inputs -> bit-identical (no dependence on pad
    # shape beyond the documented RNG-stream row indexing); different
    # subgraph SETS with the same bounds reuse the same traced shapes
    r2 = pipe.predict(novel, max_n_cc=4, max_len_cc=6)
    np.testing.assert_array_equal(r1["logits"], r2["logits"])
    r3 = pipe.predict([[7, 8], [20, 21, 22]], max_n_cc=4, max_len_cc=6)
    assert r3["logits"].shape == r1["logits"].shape


def test_predict_request_count_never_retraces(mini_root):
    """Serving is N-invariant: per-batch anchor/cc-table slicing keeps
    every jit argument at (batch_size, ...) shapes, so requests of any
    subgraph COUNT reuse one traced program (each retrace would be a
    multi-minute remote compile over the axon tunnel)."""
    from subgnn_tpu.config import HParams, RunConfig
    from subgnn_tpu.train.runner import SubGNNPipeline

    rc = RunConfig(task="mini", project_root=mini_root)
    hp = HParams(max_epochs=1, use_neighborhood=True, use_position=True,
                 use_structure=False, batch_size=4, n_layers=1,
                 node_embed_size=8, linear_hidden_dim_1=8,
                 linear_hidden_dim_2=8, n_anchor_patches_N_in=2,
                 n_anchor_patches_N_out=2, n_anchor_patches_pos_in=2,
                 n_anchor_patches_pos_out=3, seed=0)
    pipe = SubGNNPipeline(rc, hp)
    pipe.run(log_fn=None)
    # varying COUNT and varying LONGEST-node-list length (subgraph_ids'
    # request-dependent pad width is dropped from the jit arguments)
    for node_lists in ([[1, 5]], [[1, 5], [2, 6], [7, 8]],
                       [[1, 5, 9, 2, 6], [2, 6]],
                       [[3, 4], [9, 10], [11, 12], [1, 2], [5, 6]]):
        r = pipe.predict(node_lists, max_n_cc=4, max_len_cc=6)
        assert len(r["pred"]) == len(node_lists)
    assert pipe._predict_fwd._cache_size() == 1, \
        pipe._predict_fwd._cache_size()


def test_reproduce_real_harness_dry_run():
    """The one-command real-dataset reproduction harness
    (scripts/reproduce_real.py, VERDICT r2 task 5) executes end-to-end on
    the miniature reference-format fixture: loader validation -> precompute
    -> frozen-config training (the reference ppi_bp hyperparams, shrunk) ->
    multi-seed test -> comparison table. The day the real datasets exist
    under data/, the same command reproduces all four tasks unattended."""
    import os
    import subprocess
    import sys

    # -mini shrinks the reference's frozen ppi_bp config; on a checkout
    # without the (non-redistributable) reference repo the harness itself
    # still works — only this dry-run's config source is absent
    ref_cfg = os.environ.get(
        "SUBGNN_REF_HPARAMS",
        "/root/reference/best_model_hyperparameters")
    if not Path(ref_cfg, "ppi_bp", "hyperparams.json").exists():
        pytest.skip("reference best_model_hyperparameters not on disk")

    repo = Path(__file__).parents[1]
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "reproduce_real.py"),
         "-mini"], capture_output=True, text=True, timeout=900,
        cwd=repo, env={**__import__("os").environ,
                       "PYTHONPATH": str(repo), "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MINI-FIXTURE" in out.stdout
    tail = json.loads(out.stdout.strip().splitlines()[-1])
    assert tail["ran"] == ["MINI-FIXTURE"] and tail["skipped"] == []


def test_reproduce_real_validation_reports_problems(tmp_path):
    """validate_task returns precise problems instead of crashing: missing
    files, unreadable edge list, embedding-row/node-count mismatch."""
    import importlib.util
    import sys

    repo = Path(__file__).parents[1]
    spec = importlib.util.spec_from_file_location(
        "reproduce_real", repo / "scripts" / "reproduce_real.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reproduce_real"] = mod
    spec.loader.exec_module(mod)

    d = tmp_path / "task"
    d.mkdir()
    probs = mod.validate_task(d, {})
    assert any("edge_list.txt" in p for p in probs)
    assert any("subgraphs.pth" in p for p in probs)
    assert any("gin_embeddings" in p for p in probs)

    # unreadable subgraphs: edge list fine, TSV row too short
    (d / "edge_list.txt").write_text("1 2\n2 3\n")
    (d / "subgraphs.pth").write_text("1-2\n")
    np.save(d / "gin_embeddings.npy", np.zeros((4, 8), np.float32))
    probs = mod.validate_task(d, {})
    assert any("subgraphs.pth unreadable" in p for p in probs)

    # embeddings too short for the graph
    (d / "subgraphs.pth").write_text(
        "1-2\tA\ttrain\n2-3\tB\tval\n1-3\tA\ttest\n")
    np.save(d / "gin_embeddings.npy", np.zeros((2, 8), np.float32))
    probs = mod.validate_task(d, {})
    assert any("rows" in p for p in probs)


def test_predict_concurrent_callers(mini_root):
    """Two threads calling predict() on one pipeline concurrently must
    produce the same outputs as serial calls — the BFS row cache is
    shared, lock-guarded state (round 5); results must not interleave or
    corrupt, and repeat calls must hit the cache (bfs_cache_miss == 0)."""
    from concurrent.futures import ThreadPoolExecutor
    from subgnn_tpu.config import HParams, RunConfig
    from subgnn_tpu.train.runner import SubGNNPipeline

    rc = RunConfig(task="mini", project_root=mini_root)
    hp = HParams(max_epochs=2, use_neighborhood=True, use_position=True,
                 use_structure=True, max_sim_epochs=1, n_triangular_walks=2,
                 random_walk_len=4, sample_walk_len=6, batch_size=4,
                 n_layers=1, node_embed_size=8, linear_hidden_dim_1=8,
                 linear_hidden_dim_2=8, n_anchor_patches_N_in=2,
                 n_anchor_patches_N_out=2, n_anchor_patches_pos_in=3,
                 n_anchor_patches_pos_out=3, n_anchor_patches_structure=2,
                 seed=0)
    pipe = SubGNNPipeline(rc, hp)
    pipe.run(log_fn=None)

    reqs = [[[1, 5, 9, 13], [2, 6, 10]],
            [[30, 31, 32, 33], [7, 8]],
            [[11, 12], [21, 22, 23]],
            [[1, 5, 9, 13], [2, 6, 10]]]  # repeats req 0
    pads = dict(max_n_cc=4, max_len_cc=4)
    serial = [np.asarray(pipe.predict(r, **pads)["logits"]) for r in reqs]
    with ThreadPoolExecutor(max_workers=4) as ex:
        conc = list(ex.map(lambda r: pipe.predict(r, **pads), reqs))
    for s, c in zip(serial, conc):
        np.testing.assert_array_equal(s, np.asarray(c["logits"]))
    # all rows were cached by the serial pass
    assert all(r["timings"].get("bfs_cache_miss", 0) == 0 for r in conc)
