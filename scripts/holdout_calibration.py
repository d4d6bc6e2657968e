"""Calibrate the nested-holdout estimator: for given configs on one
instance, report per-seed HOLDOUT vs TEST micro-F1 from the SAME run —
if the estimator is exchangeable, they agree in expectation per config.

PYTHONPATH=/root/repo python scripts/holdout_calibration.py \
    -task coreness5k_s53 -configs /root/reference/best_model_hyperparameters/coreness/S_coreness_hyperparams.json
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-task", required=True)
    ap.add_argument("-project_root", default="data")
    ap.add_argument("-configs", required=True,
                    help="comma-separated hyperparams.json paths")
    ap.add_argument("-seeds", type=int, default=4)
    ap.add_argument("-max_epochs", type=int, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from subgnn_tpu.config import RunConfig
    from subgnn_tpu.data.subgraphs import read_subgraphs
    from subgnn_tpu.train.runner import SubGNNPipeline, load_best_hyperparams

    root = Path(args.project_root)
    rc = RunConfig(task=args.task, project_root=root)
    tr, *_ = read_subgraphs(root / args.task / "subgraphs.pth")
    holdout = np.random.default_rng(777).choice(
        len(tr), size=max(25, len(tr) // 5), replace=False)

    for cfg in args.configs.split(","):
        hp = load_best_hyperparams(cfg)
        if args.max_epochs:
            hp = hp.replace(max_epochs=args.max_epochs)
        rows = []
        for s in range(args.seeds):
            pipe = SubGNNPipeline(rc, hp.replace(seed=s),
                                  train_holdout=holdout)
            out = pipe.run(log_fn=None)
            rows.append((out["holdout"]["holdout_micro_f1"],
                         out["test"]["test_micro_f1"],
                         out["best_monitor"]))
            print(f"  seed {s}: holdout={rows[-1][0]:.3f} "
                  f"test={rows[-1][1]:.3f} best_val={rows[-1][2]:.3f}",
                  flush=True)
        h, t, v = (np.mean([r[i] for r in rows]) for i in range(3))
        print("CALIB " + json.dumps({
            "task": args.task, "config": str(cfg),
            "holdout_mean": round(float(h), 4),
            "test_mean": round(float(t), 4),
            "best_val_mean": round(float(v), 4),
            "seeds": args.seeds}), flush=True)


if __name__ == "__main__":
    main()
