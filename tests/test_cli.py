import json
from pathlib import Path

import numpy as np
import pytest

from subgnn_tpu.train.hpo import Study, Trial, hyperparams_from_config, suggest_from_spec
from subgnn_tpu.config import RunConfig


def test_trial_suggest_types():
    t = Trial(np.random.default_rng(0))
    c = t.suggest_categorical("bs", [64, 128])
    assert c in (64, 128)
    i = t.suggest_int("n_layers", 1, 5)
    assert 1 <= i <= 5
    f = t.suggest_float("lr", 1e-4, 1e-3, log=True)
    assert 1e-4 <= f <= 1e-3
    assert set(t.params) == {"bs", "n_layers", "lr"}


def test_suggest_from_reference_spec():
    # the exact spec format shipped in config_files/*.json
    spec = {"type": "suggest_float", "args": [1e-4, 1e-3], "kwargs": {"log": True}}
    t = Trial(np.random.default_rng(1))
    v = suggest_from_spec(t, "learning_rate", spec)
    assert 1e-4 <= v <= 1e-3
    spec_cat = {"type": "suggest_categorical", "args": [[64, 128]]}
    v2 = suggest_from_spec(t, "batch_size", spec_cat)
    assert v2 in (64, 128)


def test_study_resume_and_best(tmp_path):
    calls = []

    def objective(trial):
        x = trial.suggest_float("x", 0.0, 1.0)
        calls.append(x)
        return x

    s = Study(tmp_path / "study.json", direction="maximize", seed=7)
    s.optimize(objective, 3)
    assert len(s.trials) == 3
    # resume: a new Study over the same file continues, not restarts
    s2 = Study(tmp_path / "study.json", direction="maximize", seed=7)
    s2.optimize(objective, 5)
    assert len(s2.trials) == 5
    assert s2.best_trial["value"] == max(t["value"] for t in s2.trials)


def test_trial_attrs_persist_and_stale_tmp_sweep(tmp_path):
    """Trial.attrs (optuna user_attrs analog) persist in the study file
    across resume — seed_avg_search uses this to mark raced trials; and
    Study.__init__ sweeps only DEAD writers' temp files."""
    def objective(trial):
        x = trial.suggest_float("x", 0.0, 1.0)
        trial.attrs["n_seeds_scored"] = 1 if x < 0.5 else 3
        return x

    s = Study(tmp_path / "study.json", direction="maximize", seed=7)
    s.optimize(objective, 3)
    # a stale temp from a dead pid + a "live" temp from our own pid
    (tmp_path / "study.json.999999.tmp").write_text("stale")
    import os
    live = tmp_path / f"study.json.{os.getpid()}.tmp"
    live.write_text("live")
    s2 = Study(tmp_path / "study.json", direction="maximize", seed=7)
    assert not (tmp_path / "study.json.999999.tmp").exists()
    assert live.exists(), "a live writer's temp must not be unlinked"
    live.unlink()
    for t in s2.trials:
        assert t["attrs"]["n_seeds_scored"] in (1, 3), t


def test_grid_sampler(tmp_path):
    space = {"a": [1, 2], "b": [10, 20]}

    def objective(trial):
        a = trial.suggest_categorical("a", [1, 2])
        b = trial.suggest_categorical("b", [10, 20])
        return a * b

    s = Study(tmp_path / "study.json", sampler="grid", grid_search_space=space)
    s.optimize(objective, 4)
    seen = {(t["params"]["a"], t["params"]["b"]) for t in s.trials}
    assert seen == {(1, 10), (1, 20), (2, 10), (2, 20)}


def test_grid_sampler_stops_at_exhaustion(tmp_path):
    """optuna's GridSampler ends the study once every point has run;
    asking for more trials than grid points must not re-run duplicates."""
    space = {"a": [1, 2], "b": [10, 20]}

    def objective(trial):
        a = trial.suggest_categorical("a", [1, 2])
        b = trial.suggest_categorical("b", [10, 20])
        return a * b

    s = Study(tmp_path / "study.json", sampler="grid", grid_search_space=space)
    s.optimize(objective, 20)
    assert len(s.trials) == 4


def test_best_trial_ignores_pruned(tmp_path):
    """optuna restricts best_trial to COMPLETE trials: a pruned trial's
    value is its best intermediate at prune time, not a trained-out
    result, so it must not win the study."""
    from subgnn_tpu.train.hpo import TrialPruned

    def objective(trial):
        x = trial.suggest_uniform("x", 0.0, 1.0)
        trial.report(2.0, 0)  # spiky intermediate, better than anyone
        if len(trial.study.trials) == 0:  # prune only the first trial
            raise TrialPruned()
        return x

    s = Study(tmp_path / "study.json", direction="maximize", seed=3)
    s.optimize(objective, 4)
    assert s.trials[0]["pruned"] and s.trials[0]["value"] == 2.0
    assert not s.best_trial["pruned"]
    assert s.best_trial["value"] == max(t["value"] for t in s.trials
                                        if not t["pruned"])
    # all-pruned study has no winner, like optuna
    def always_pruned(trial):
        trial.report(1.0, 0)
        raise TrialPruned()

    s2 = Study(tmp_path / "study2.json", direction="maximize", seed=3)
    s2.optimize(always_pruned, 2)
    with pytest.raises(ValueError):
        _ = s2.best_trial


def test_best_monitor_value_direction():
    """The HPO objective takes min over epochs exactly for val_loss
    (reference train.py:432-435), max otherwise."""
    from subgnn_tpu.train.loop import Trainer
    t = Trainer.__new__(Trainer)
    t.metric_scores = [{"val_loss": 0.9, "val_micro_f1": 0.2},
                       {"val_loss": 0.1, "val_micro_f1": 0.8}]
    t.monitor = "val_loss"
    assert Trainer.best_monitor_value(t) == pytest.approx(0.1)
    t.monitor = "val_micro_f1"
    assert Trainer.best_monitor_value(t) == pytest.approx(0.8)


def test_run_config_parses_reference_config(tmp_path):
    cfg = """{
        "data": {"task": "hpo_metab"},
        // comment line like commentjson allows
        "tb": {"tb_logging": true, "dir": "tensorboard", "name": "S_metab"},
        "optuna": {"opt_n_trials": 50, "opt_n_cores": 1,
                   "monitor_metric": "val_micro_f1",
                   "opt_direction": "maximize", "sampler": "random",
                   "pruning": false},
        "hyperparams_fix": {"max_epochs": 300, "use_structure": true},
        "hyperparams_optuna": {
            "batch_size": {"type": "suggest_categorical", "args": [[64, 128]]}
        }
    }"""
    p = tmp_path / "cfg.json"
    p.write_text(cfg)
    rc = RunConfig.from_json(p)
    assert rc.task == "hpo_metab"
    assert rc.opt_n_trials == 50
    assert rc.hyperparams_fix["max_epochs"] == 300
    hyp = hyperparams_from_config(rc, Trial(np.random.default_rng(0)))
    assert hyp["batch_size"] in (64, 128)
    assert hyp["max_epochs"] == 300


@pytest.mark.slow
def test_study_end_to_end(tmp_path):
    """2-trial study over the tiny synthetic density dataset."""
    from subgnn_tpu.prepare.synthetic import build_synthetic_dataset
    from subgnn_tpu.prepare.node_emb import train_node_embeddings, save_embeddings
    from subgnn_tpu.data.graph import CSRGraph
    from subgnn_tpu.cli.train_config import run_study

    root = tmp_path
    task_dir = root / "density"
    build_synthetic_dataset(task_dir, "density", seed=1, n=80, m=3,
                            n_subgraphs=24, n_subgraph_nodes=6, max_tries=20)
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    emb, _ = train_node_embeddings(g, out_dim=8, hidden=16, epochs=10)
    save_embeddings(task_dir, emb, "gin")

    cfg = {
        "data": {"task": "density"},
        "tb": {"dir": "tb", "name": "toy"},
        "optuna": {"opt_n_trials": 2, "monitor_metric": "val_micro_f1",
                   "opt_direction": "maximize", "sampler": "random",
                   "pruning": False},
        "hyperparams_fix": {
            "max_epochs": 2, "use_neighborhood": False, "use_structure": True,
            "use_position": False, "seed": 0, "batch_size": 8,
            "n_anchor_patches_structure": 3, "n_triangular_walks": 2,
            "random_walk_len": 5, "sample_walk_len": 8, "max_sim_epochs": 2,
            "linear_hidden_dim_1": 8, "linear_hidden_dim_2": 8,
            "embedding_type": "gin", "n_layers": 1,
        },
        "hyperparams_optuna": {
            "learning_rate": {"type": "suggest_float", "args": [1e-4, 1e-2],
                              "kwargs": {"log": True}}
        },
    }
    cfg_path = root / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    study = run_study(str(cfg_path), project_root=str(root), log_fn=None)
    assert len(study.trials) == 2
    assert all(np.isfinite(t["value"]) for t in study.trials)
    assert (root / "tb" / "toy" / "study.json").exists()


@pytest.mark.slow
def test_train_cli_main(tmp_path, monkeypatch):
    """The argparse driver end-to-end on a tiny dataset."""
    import sys, json
    from subgnn_tpu.prepare.synthetic import build_synthetic_dataset
    from subgnn_tpu.prepare.node_emb import train_node_embeddings, save_embeddings
    from subgnn_tpu.data.graph import CSRGraph
    from subgnn_tpu.cli import train as train_cli

    root = tmp_path
    task_dir = root / "density"
    build_synthetic_dataset(task_dir, "density", seed=2, n=80, m=3,
                            n_subgraphs=24, n_subgraph_nodes=6, max_tries=20)
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    emb, _ = train_node_embeddings(g, out_dim=8, hidden=16, epochs=5)
    save_embeddings(task_dir, emb, "gin")
    hyp = dict(train_cli.default_hyperparams(), max_epochs=2, batch_size=8,
               n_layers=1, use_neighborhood=False, use_position=False,
               n_anchor_patches_structure=3, n_triangular_walks=2,
               random_walk_len=5, sample_walk_len=8, max_sim_epochs=2,
               linear_hidden_dim_1=8, linear_hidden_dim_2=8)
    hyp_path = root / "hyp.json"
    hyp_path.write_text(json.dumps(hyp))
    monkeypatch.setattr(sys, "argv", [
        "train", "-task", "density", "-project_root", str(root),
        "-hyperparams", str(hyp_path), "-tb_name", "cli_run"])
    train_cli.main()
    assert (root / "tensorboard" / "cli_run" / "test_results.json").exists()
    assert (root / "tensorboard" / "cli_run" / "hyperparams.json").exists()


def test_tpe_sampler_concentrates_and_matches_random_or_better(tmp_path):
    """sampler='tpe' (the reference's optuna default,
    train_config.py:255-262): after the random startup phase, proposals
    concentrate near the optimum, and the categorical ratio picks the
    winning arm."""
    import numpy as np

    def objective(trial):
        x = trial.suggest_float("x", 0.0, 1.0)
        return -((x - 0.7) ** 2)

    tpe = Study(tmp_path / "tpe.json", direction="maximize", sampler="tpe",
                seed=1)
    tpe.optimize(objective, 40)
    xs = np.array([t["params"]["x"] for t in tpe.trials])
    # startup (first 10) is random; the last 20 should be much closer to 0.7
    assert np.mean(np.abs(xs[-20:] - 0.7)) < np.mean(np.abs(xs[:10] - 0.7))

    # categorical arm selection, unconfounded
    def cat_objective(trial):
        return {"a": 0.0, "b": 1.0, "c": 0.2}[
            trial.suggest_categorical("c", ["a", "b", "c"])]

    cat = Study(tmp_path / "cat.json", direction="maximize", sampler="tpe",
                seed=2)
    cat.optimize(cat_objective, 40)
    cs = [t["params"]["c"] for t in cat.trials]
    assert sum(c == "b" for c in cs[-20:]) > 10

    rand = Study(tmp_path / "rand.json", direction="maximize",
                 sampler="random", seed=1)
    rand.optimize(objective, 40)
    assert tpe.best_trial["value"] >= rand.best_trial["value"] - 1e-2

    # resume keeps the TPE history (same file -> continues concentrated)
    tpe2 = Study(tmp_path / "tpe.json", direction="maximize", sampler="tpe",
                 seed=1)
    tpe2.optimize(objective, 45)
    assert len(tpe2.trials) == 45
    tail = np.array([t["params"]["x"] for t in tpe2.trials[-5:]])
    assert np.mean(np.abs(tail - 0.7)) < 0.2


def test_graphsaint_embedding_path(tmp_path):
    """embedding_type='graphsaint' resolves the reference's
    graphsaint_gcn_embeddings.pth filename (reference:
    train_config.py:226-231)."""
    rc = RunConfig(project_root=str(tmp_path), task="t")
    assert rc.embedding_path("graphsaint").name == "graphsaint_gcn_embeddings.pth"
    assert rc.embedding_path("graphsaint_gcn").name == "graphsaint_gcn_embeddings.pth"
    assert rc.embedding_path("gin").name == "gin_embeddings.pth"
    with pytest.raises(NotImplementedError):
        rc.embedding_path("word2vec")


def test_suggest_float_step_includes_high():
    """(high-low)/step floats to 3.9999…; truncation would silently drop
    the high endpoint from the random sampler's space (review round-2 fix)."""
    from subgnn_tpu.train.hpo import Trial
    seen = set()
    for i in range(200):
        t = Trial(np.random.default_rng(i))
        seen.add(round(t.suggest_float("x", 0.1, 0.5, step=0.1), 6))
    assert round(0.5, 6) in seen, sorted(seen)
    assert seen <= {0.1, 0.2, 0.3, 0.4, 0.5}, sorted(seen)


def test_in_driver_optuna_ranges_and_quirks():
    """get_hyperparams_optuna mirrors reference train.py:152-192 including
    the two name quirks: n_layers drawn under the optuna name
    'gamma_shortest_max_distance_N', and linear_hidden_dim_1/2 sharing one
    suggest name (hence always equal)."""
    import argparse
    from subgnn_tpu.cli.train import get_hyperparams_optuna

    args = argparse.Namespace(max_epochs=7)
    for i in range(5):
        t = Trial(np.random.default_rng(i))
        hyp = get_hyperparams_optuna(args, t)
        assert hyp["linear_hidden_dim_1"] == hyp["linear_hidden_dim_2"]
        assert "linear_hidden_dim" in t.params
        assert "linear_hidden_dim_1" not in t.params
        assert hyp["n_layers"] == t.params["gamma_shortest_max_distance_N"]
        assert 1 <= hyp["n_layers"] <= 5
        assert 64 <= hyp["batch_size"] <= 150
        assert 1e-5 <= hyp["learning_rate"] <= 1e-3
        assert hyp["max_epochs"] == 7
        assert hyp["use_neighborhood"] and not hyp["use_structure"]


def test_trial_repeated_name_returns_same_value():
    """optuna semantics: re-suggesting an existing name in one trial
    returns the first draw (what makes the shared-name quirk work)."""
    t = Trial(np.random.default_rng(0))
    a = t.suggest_int("d", 1, 1000)
    assert t.suggest_int("d", 1, 1000) == a
    b = t.suggest_float("f", 0.0, 1.0)
    assert t.suggest_float("f", 0.0, 1.0) == b
    c = t.suggest_categorical("c", ["x", "y", "z"])
    assert t.suggest_categorical("c", ["x", "y", "z"]) == c


def test_train_cli_in_driver_search(tmp_path, monkeypatch, capsys):
    """-opt_n_trials runs the reference's flow (2): a resumable study over
    in-driver ranges (reference train.py:448-493). Ranges are patched tiny
    so two full trials train in seconds; the real ranges are asserted in
    test_in_driver_optuna_ranges_and_quirks."""
    import sys
    from subgnn_tpu.prepare.synthetic import build_synthetic_dataset
    from subgnn_tpu.prepare.node_emb import train_node_embeddings, save_embeddings
    from subgnn_tpu.data.graph import CSRGraph
    from subgnn_tpu.cli import train as train_cli

    root = tmp_path
    task_dir = root / "density"
    build_synthetic_dataset(task_dir, "density", seed=3, n=80, m=3,
                            n_subgraphs=24, n_subgraph_nodes=6, max_tries=20)
    g = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    emb, _ = train_node_embeddings(g, out_dim=8, hidden=16, epochs=5)
    save_embeddings(task_dir, emb, "gin")

    def tiny_ranges(args, trial):
        return dict(
            seed=42, max_epochs=2, batch_size=8,
            learning_rate=trial.suggest_float("learning_rate", 1e-4, 1e-2,
                                              log=True),
            n_layers=1, use_neighborhood=False, use_structure=True,
            use_position=False, n_anchor_patches_structure=3,
            n_triangular_walks=2, random_walk_len=5, sample_walk_len=8,
            max_sim_epochs=2, linear_hidden_dim_1=8, linear_hidden_dim_2=8,
            embedding_type="gin",
        )

    monkeypatch.setattr(train_cli, "get_hyperparams_optuna", tiny_ranges)
    monkeypatch.setattr(sys, "argv", [
        "train", "-task", "density", "-project_root", str(root),
        "-tb_name", "indriver", "-opt_n_trials", "2"])
    train_cli.main()
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert "best_params" in payload and "learning_rate" in payload["best_params"]
    study_file = root / "tensorboard" / "indriver" / "study.json"
    assert study_file.exists()
    trials = json.loads(study_file.read_text())["trials"]
    assert len(trials) == 2 and all(np.isfinite(t["value"]) for t in trials)


def test_grid_search_space_mechanics():
    """-grid_search's fixed space (reference train.py:471-474): 8 points;
    neigh_sample_border_size is honored by the suggest call while
    gamma_shortest_max_distance_P is a dead dimension (never suggested by
    the ranges) — reproduced as-is."""
    import argparse
    from subgnn_tpu.cli.train import get_hyperparams_optuna, GRID_SEARCH_SPACE
    from subgnn_tpu.train.hpo import _grid_points

    points = _grid_points(GRID_SEARCH_SPACE)
    assert len(points) == 8
    seen_border = set()
    for i, fixed in enumerate(points):
        t = Trial(np.random.default_rng(i), fixed=fixed)
        hyp = get_hyperparams_optuna(argparse.Namespace(max_epochs=2), t)
        assert hyp["neigh_sample_border_size"] == fixed["neigh_sample_border_size"]
        assert "gamma_shortest_max_distance_P" not in t.params
        seen_border.add(hyp["neigh_sample_border_size"])
    assert seen_border == {1, 2}
