"""A/B-validate the hand-rolled TPE sampler on the reference-shaped
multivariate search spaces (VERDICT r2 task 3).

Real optuna is NOT in this environment (train/hpo.py is the
optuna-API-compatible replacement), so the validation is an A/B against
random search at the reference's trial budget on the ACTUAL spaces the
protocol rows searched:

  * shallow space (run_synthetic_protocol.py cfg): log-uniform lr,
    grad_clip, cc_aggregator {sum,max}, lin_dropout, trainable_cc
  * deep space (-deep): + n_layers 1-4, batch_size {64,128},
    n_anchor_patches_structure 15-45, lstm_n_layers 1-2, lstm_dropout

Two objectives:

  * `surrogate` (default, seconds): a fixed smooth response surface over
    the space with observation noise — the shape of a val-metric
    landscape (one broad optimum, log-scale lr sensitivity, weak
    categorical effects, sd 0.03 seed noise). 40 trials x N reps per
    sampler; reports best-found distributions and the TPE win rate.
    Validates the sampler MECHANICS (split/KDE/EI) at protocol scale.
  * `real`: the same A/B where each trial trains density250 for
    -real_epochs epochs on CPU and returns val micro-F1 (slow; run via
    the round-3 queue). Validates against a true response surface.

Usage:
  PYTHONPATH=/root/repo python scripts/validate_tpe.py -reps 20
  PYTHONPATH=/root/repo python scripts/validate_tpe.py -objective real \
      -reps 3 -trials 40 -real_epochs 30
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def suggest_shallow(trial):
    return {
        "learning_rate": trial.suggest_float("learning_rate", 3e-4, 1e-2,
                                             log=True),
        "grad_clip": trial.suggest_float("grad_clip", 0.0, 0.5),
        "cc_aggregator": trial.suggest_categorical("cc_aggregator",
                                                   ["sum", "max"]),
        "lin_dropout": trial.suggest_float("lin_dropout", 0.0, 0.4),
        "trainable_cc": trial.suggest_categorical("trainable_cc",
                                                  [True, False]),
    }


def suggest_deep(trial):
    p = suggest_shallow(trial)
    p.update({
        "n_layers": trial.suggest_int("n_layers", 1, 4),
        "batch_size": trial.suggest_categorical("batch_size", [64, 128]),
        "n_anchor_patches_structure":
            trial.suggest_int("n_anchor_patches_structure", 15, 45),
        "lstm_n_layers": trial.suggest_int("lstm_n_layers", 1, 2),
        "lstm_dropout": trial.suggest_float("lstm_dropout", 0.0, 0.3),
    })
    return p


def surrogate_value(p, rng):
    """Smooth val-metric-shaped response: broad log-lr optimum at 2e-3,
    mild dropout/grad_clip curvature, small categorical effects,
    interaction between n_layers and lr (deeper wants lower lr), plus
    0.03-sd noise (the per-seed variance real trials see)."""
    v = 0.85
    v -= 0.55 * (math.log10(p["learning_rate"]) - math.log10(2e-3)) ** 2
    v -= 0.30 * (p["lin_dropout"] - 0.15) ** 2
    v -= 0.20 * (p["grad_clip"] - 0.25) ** 2
    v += 0.02 * (p["cc_aggregator"] == "sum")
    v += 0.01 * (not p["trainable_cc"])
    if "n_layers" in p:
        target_lr = math.log10(2e-3) - 0.15 * (p["n_layers"] - 1)
        v -= 0.25 * (math.log10(p["learning_rate"]) - target_lr) ** 2
        v += 0.015 * (p["n_layers"] == 2)
        v -= 0.10 * (p["lstm_dropout"] - 0.1) ** 2
        v += 0.01 * (p["batch_size"] == 64)
        v -= 0.00002 * (p["n_anchor_patches_structure"] - 28) ** 2
    return v + 0.03 * rng.standard_normal()


def run_rep(sampler: str, rep: int, suggest, objective, trials: int) -> float:
    from subgnn_tpu.train.hpo import Study
    with tempfile.TemporaryDirectory() as td:
        study = Study(Path(td) / "study.json", direction="maximize",
                      sampler=sampler, seed=1000 * rep + 7)
        study.optimize(lambda t: objective(suggest(t)), n_trials=trials)
        return float(study.best_trial["value"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-objective", default="surrogate",
                    choices=["surrogate", "real"])
    ap.add_argument("-trials", type=int, default=40)
    ap.add_argument("-reps", type=int, default=20)
    ap.add_argument("-spaces", default="shallow,deep")
    ap.add_argument("-real_epochs", type=int, default=30)
    ap.add_argument("-project_root", default="data")
    args = ap.parse_args()

    if args.objective == "real":
        import jax
        jax.config.update("jax_platforms", "cpu")
        from subgnn_tpu.cli.prepare_dataset import prepare
        from subgnn_tpu.config import HParams, RunConfig
        from subgnn_tpu.train.runner import SubGNNPipeline

        task_dir = Path(args.project_root) / "density250"
        if not (task_dir / "subgraphs.pth").exists():
            prepare(task_dir, "density", seed=42, emb_epochs=100, n=1000,
                    n_subgraphs=250, n_subgraph_nodes=20)
        rc = RunConfig(task="density250", project_root=Path(args.project_root))
        base = dict(max_epochs=args.real_epochs, use_neighborhood=False,
                    use_structure=True, use_position=False, seed=3,
                    batch_size=64, n_layers=1, n_anchor_patches_structure=20,
                    linear_hidden_dim_1=64, linear_hidden_dim_2=32)

        def objective(p):
            hp = HParams.from_dict({**base, **p})
            out = SubGNNPipeline(rc, hp).run(log_fn=None)
            return float(out["best_monitor"])
    else:
        def objective(p):
            # noise keyed off the params so both samplers face the same
            # stochastic surface, not the same draw sequence; sha256, not
            # hash() — the builtin is salted per process and would make
            # the recorded validation numbers irreproducible
            import hashlib
            key = repr(sorted((k, str(v)) for k, v in p.items())).encode()
            h = int.from_bytes(hashlib.sha256(key).digest()[:4], "big")
            return surrogate_value(p, np.random.default_rng(h))

    for space in args.spaces.split(","):
        suggest = suggest_shallow if space == "shallow" else suggest_deep
        res = {}
        for sampler in ("tpe", "random"):
            bests = [run_rep(sampler, r, suggest, objective, args.trials)
                     for r in range(args.reps)]
            res[sampler] = bests
            print(f"{space}/{sampler}: best={np.mean(bests):.4f} "
                  f"+/- {np.std(bests):.4f}  (per-rep: "
                  f"{[round(b, 3) for b in bests]})", flush=True)
        t, r = np.array(res["tpe"]), np.array(res["random"])
        print(json.dumps({
            "space": space, "objective": args.objective,
            "trials": args.trials, "reps": args.reps,
            "tpe_mean": float(t.mean()), "tpe_sd": float(t.std()),
            "random_mean": float(r.mean()), "random_sd": float(r.std()),
            "tpe_win_rate": float((t > r).mean() + 0.5 * (t == r).mean()),
            "delta_mean": float((t - r).mean())}), flush=True)


if __name__ == "__main__":
    main()
