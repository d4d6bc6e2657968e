"""Signal probe for a stand-in (or any prepared task dir): can the
quantities gamma_S consumes rank the labels at all?

Fits a per-class logistic probe on the precomputed structure similarity
vectors (internal + border, train split) and reports val AUROC per
class. This separates "the instance has no selection-accessible signal"
from "the model/optimizer cannot couple to it" — the round-5 forensics
that caught the saturated-GIN stand-in defect (probe 0.744 while every
SubGNN config sat at AUROC 0.500; RESULTS.md round 5).

  PYTHONPATH=/root/repo python scripts/standin_probe.py -task hpo_neuro_sl

Needs the task's similarities/ cache (run any training once, or
runner.precompute). Runs on CPU.
"""
from __future__ import annotations

import argparse
import glob
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def load_split_sims(task_dir: Path, split: str) -> np.ndarray:
    mats = []
    for kind in ("int_struc", "bor_struc"):
        hits = sorted(glob.glob(str(
            task_dir / "similarities" / f"{kind}_*_{split}_similarities.npy")))
        if not hits:
            raise SystemExit(
                f"no {kind} {split} similarity cache under {task_dir}; "
                "run one training first to populate similarities/")
        a = np.load(hits[0])
        mats.append(a.reshape(a.shape[0], -1))
    return np.concatenate(mats, axis=1)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("-task", required=True)
    ap.add_argument("-project_root", default="data")
    args = ap.parse_args()
    task_dir = Path(args.project_root) / args.task

    from subgnn_tpu.data.subgraphs import read_subgraphs
    tr, trl, va, val, te, tel, ml = read_subgraphs(task_dir / "subgraphs.pth")
    classes = sorted({c for labs in (list(trl) + list(val))
                      for c in (labs if ml else [labs])})

    def binarize(labels):
        y = np.zeros((len(labels), len(classes)), np.int32)
        for i, ls in enumerate(labels):
            for c in (ls if ml else [ls]):
                y[i, classes.index(c)] = 1
        return y

    y, yv = binarize(trl), binarize(val)
    X, Xv = load_split_sims(task_dir, "train"), load_split_sims(task_dir, "val")
    mu, sd = X.mean(0), X.std(0) + 1e-9
    X, Xv = (X - mu) / sd, (Xv - mu) / sd

    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import roc_auc_score
    aucs = {}
    for c in range(y.shape[1]):
        if len(set(yv[:, c])) < 2 or len(set(y[:, c])) < 2:
            continue
        clf = LogisticRegression(max_iter=500, C=1.0).fit(X, y[:, c])
        aucs[str(classes[c])] = round(
            float(roc_auc_score(yv[:, c], clf.decision_function(Xv))), 3)
    mean_auc = float(np.mean(list(aucs.values()))) if aucs else float("nan")
    print(f"probe val AUROC per class: {aucs}")
    print(f"PROBE {{\"task\": \"{args.task}\", \"mean_val_auroc\": "
          f"{mean_auc:.3f}, \"n_classes\": {len(aucs)}}}")
    if mean_auc < 0.55:
        print("-> no gamma_S-accessible signal: searches on this instance "
              "can only demonstrate protocol flow, not model selection")


if __name__ == "__main__":
    main()
