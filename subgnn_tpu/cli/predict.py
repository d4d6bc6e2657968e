"""Serving CLI: classify NEW subgraphs with a trained checkpoint.

An EXTENSION over the reference (SubGNN/test.py only re-trains and
evaluates the pre-split dataset): restore a trained run and classify
arbitrary node lists over the same base graph, with the per-subgraph
precompute (CC split, border sets, rows-path NP sims, DTW vs the
persisted anchor pool) computed on the fly.

Usage:
  python -m subgnn_tpu.cli.predict -task density -project_root data \\
      -restoreModelPath <results dir with hyperparams.json + checkpoints/> \\
      -subgraphs new_subgraphs.txt [-out predictions.json]

new_subgraphs.txt: one subgraph per line, '-'-joined **1-based** node ids
(the framework's internal convention: 0 is PAD). NOTE: the node-id column
of subgraphs.pth uses RAW 0-based ids (reference
prepare_dataset/prepare_dataset.py:781-799) — copying ids from that file
verbatim would shift every node by one; add 1 first.
"""
from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

from ..config import RunConfig
from ..train.checkpoint import dump_json, load_checkpoint
from ..train.runner import SubGNNPipeline, load_best_hyperparams


def read_node_lists(path: str | Path):
    """One subgraph per line, '-'-joined 1-based node ids."""
    lists = []
    for line in Path(path).read_text().strip().split("\n"):
        line = line.strip().split("\t")[0]
        if line:
            lists.append([int(tok) for tok in line.split("-")])
    return lists


def find_best_checkpoint(results_dir: str | Path) -> Path:
    """Best .ckpt under <results_dir>/checkpoints by the val_micro_f1
    embedded in the TopKCheckpoints filename."""
    ckpt_dir = Path(results_dir) / "checkpoints"
    best, best_v = None, float("-inf")
    for p in sorted(ckpt_dir.glob("*.ckpt")):
        m = re.search(r"val_micro_f1=([0-9.]+)", p.name)
        v = float(m.group(1)) if m else float("-inf")
        if v > best_v:
            best, best_v = p, v
    if best is None:
        raise FileNotFoundError(f"no .ckpt files under {ckpt_dir}")
    return best


def run_predict(task: str, project_root: str, restore_path: str,
                node_lists, checkpoint: str | None = None,
                log_fn=print) -> dict:
    restore = Path(restore_path)
    hp = load_best_hyperparams(restore / "hyperparams.json")
    rc = RunConfig(task=task, project_root=Path(project_root))
    pipe = SubGNNPipeline(rc, hp)
    pipe.load()
    pipe.precompute()
    _, params, state, _ = pipe.build_model()
    ckpt = Path(checkpoint) if checkpoint else find_best_checkpoint(restore)
    payload = load_checkpoint(ckpt)
    from ..train.checkpoint import load_params_filtered
    params = load_params_filtered(ckpt, params, payload=payload)
    state = payload.get("state") or state
    if log_fn:
        log_fn(f"restored {ckpt.name}; predicting {len(node_lists)} "
               f"subgraphs")
    res = pipe.predict(node_lists, params=params, state=state)
    return {"pred": res["pred"].tolist(), "probs": res["probs"].tolist(),
            "checkpoint": str(ckpt),
            "classes": (pipe.binarizer.classes_.tolist()
                        if pipe.multilabel else None)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-task", required=True)
    ap.add_argument("-project_root", required=True)
    ap.add_argument("-restoreModelPath", required=True,
                    help="results dir with hyperparams.json + checkpoints/")
    ap.add_argument("-subgraphs", required=True,
                    help="file with one '-'-joined node-id list per line")
    ap.add_argument("-checkpoint", default=None,
                    help="explicit .ckpt path (default: best by "
                         "val_micro_f1 in the filename)")
    ap.add_argument("-out", default=None, help="write predictions JSON here")
    args = ap.parse_args(argv)

    node_lists = read_node_lists(args.subgraphs)
    out = run_predict(args.task, args.project_root, args.restoreModelPath,
                      node_lists, checkpoint=args.checkpoint)
    if args.out:
        dump_json(args.out, out)
    print(json.dumps({"n": len(node_lists), "pred": out["pred"]}))


if __name__ == "__main__":
    main()
