"""Pytree checkpoints with metric-keyed top-k retention.

Reference behavior: PL ModelCheckpoint keeps the top-3 checkpoints on the
monitored metric with a metric-bearing filename, plus a hyperparams.json
sidecar (reference: SubGNN/train_config.py:144-150,174-176).
"""
from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str | Path, params, state=None,
                    opt_state=None, meta: Dict[str, Any] | None = None):
    payload = {
        "params": _to_numpy(params),
        "state": _to_numpy(state) if state is not None else None,
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "meta": meta or {},
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str | Path):
    with open(path, "rb") as f:
        return pickle.load(f)


def load_params_filtered(path: str | Path, current_params, payload=None):
    """Restore, keeping only leaves whose path exists in current_params —
    the reference's filtered state_dict intersection load
    (reference: SubGNN/train.py:264-273,398-408). Pass `payload` (an
    already-load_checkpoint'ed dict) to avoid re-reading the file when the
    caller also needs state/opt_state."""
    if payload is None:
        payload = load_checkpoint(path)
    saved = payload["params"]

    def merge(cur, sav):
        if isinstance(cur, dict):
            return {k: merge(cur[k], sav[k]) if isinstance(sav, dict) and k in sav
                    else cur[k] for k in cur}
        if isinstance(cur, list):
            if not isinstance(sav, list):
                return cur
            # overlap merges positionally; the current model's EXTRA layers
            # keep their init (zip would silently truncate them — e.g.
            # restoring an n_layers=2 checkpoint into an n_layers=3 model)
            return [merge(c, sav[i]) if i < len(sav) else c
                    for i, c in enumerate(cur)]
        if sav is not None and np.shape(sav) == np.shape(cur):
            return sav
        return cur

    return merge(current_params, saved)


class TopKCheckpoints:
    """Keep the best-k checkpoints by a monitored metric (mode='max')."""

    def __init__(self, ckpt_dir: str | Path, k: int = 3,
                 monitor: str = "val_micro_f1", mode: str = "max"):
        self.dir = Path(ckpt_dir)
        self.k = k
        self.monitor = monitor
        self.mode = mode
        self.kept: List[Tuple[float, Path]] = []

    def maybe_save(self, epoch: int, metrics: Dict[str, float],
                   params, state=None, opt_state=None,
                   global_step: int | None = None) -> bool:
        value = float(metrics.get(self.monitor, float("-inf")))
        key = value if self.mode == "max" else -value
        if np.isnan(key):
            # a NaN monitor (e.g. val_auroc on degenerate splits) must not
            # win best_path: NaN compares False everywhere, so it would
            # save every epoch and sort arbitrarily
            return False
        if len(self.kept) >= self.k and key <= min(v for v, _ in self.kept):
            return False
        fname = (f"epoch={epoch}-val_micro_f1={metrics.get('val_micro_f1', 0):.2f}"
                 f"-val_acc={metrics.get('val_acc', 0):.2f}"
                 f"-val_auroc={metrics.get('val_auroc', 0):.2f}.ckpt")
        path = self.dir / fname
        meta = {"epoch": epoch, **{k: float(v) for k, v in metrics.items()
                                   if isinstance(v, (int, float))}}
        if global_step is not None:
            meta["global_step"] = int(global_step)
        save_checkpoint(path, params, state, opt_state, meta=meta)
        self.kept.append((key, path))
        self.kept.sort(key=lambda t: -t[0])
        while len(self.kept) > self.k:
            _, worst = self.kept.pop()
            worst.unlink(missing_ok=True)
        return True

    @property
    def best_path(self) -> Path | None:
        return self.kept[0][1] if self.kept else None


def dump_json(path: str | Path, obj: Dict[str, Any]):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=4, default=float)
