"""Scan fresh synthetic instance draws for their oracle ceiling.

VERDICT r2 task 1 asks for "a fresh instance targeted to have a >=0.92
ceiling": the paper's density number (0.919) was measured on ONE instance
draw whose ceiling we cannot measure (no egress), while our draws' ceilings
span 0.80-0.92 (RESULTS.md) — so a paper-vs-us comparison needs an
instance whose label-consistency ceiling is at least as high as the score
being matched. Generating a candidate graph + subgraphs costs seconds and
the nearest-class-mean oracle (scripts/instance_oracle.py) needs nothing
else, so scan MANY generator seeds first and only fully prepare
(embeddings + metrics, minutes each) the highest-ceiling winners.

    PYTHONPATH=/root/repo python scripts/density_instance_scan.py \
        -seeds 46:66 [-property density] [-keep_top 2]

Graph-only candidate dirs for non-winners are deleted unless -keep_all.
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# the ONE oracle implementation — shared with the per-task oracle rows
from scripts.instance_oracle import oracle_ceiling  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-seeds", default="46:66",
                    help="generator seed range lo:hi (hi exclusive) or "
                         "comma list")
    ap.add_argument("-property", default="density",
                    choices=["density", "cut_ratio", "coreness", "cc"])
    ap.add_argument("-task_prefix", default=None,
                    help="candidate dir prefix (default <prop>250_s)")
    ap.add_argument("-n", type=int, default=1000)
    ap.add_argument("-n_subgraphs", type=int, default=250)
    ap.add_argument("-n_subgraph_nodes", type=int, default=20)
    ap.add_argument("-keep_top", type=int, default=2,
                    help="keep the top-k candidate dirs, delete the rest")
    ap.add_argument("-keep_all", action="store_true")
    ap.add_argument("-project_root", default="data")
    args = ap.parse_args()

    from subgnn_tpu.prepare.synthetic import build_synthetic_dataset

    if ":" in args.seeds:
        lo, hi = (int(x) for x in args.seeds.split(":"))
        seeds = list(range(lo, hi))
    else:
        seeds = [int(x) for x in args.seeds.split(",")]

    short = {"density": "density", "cut_ratio": "cutratio",
             "coreness": "coreness", "cc": "component"}[args.property]
    prefix = args.task_prefix or f"{short}250_s"
    root = Path(args.project_root)

    rows = []
    for s in seeds:
        d = root / f"{prefix}{s}"
        try:
            if not (d / "subgraphs.pth").exists():
                build_synthetic_dataset(d, desired_property=args.property,
                                        seed=s, n=args.n,
                                        n_subgraphs=args.n_subgraphs,
                                        n_subgraph_nodes=args.n_subgraph_nodes)
        except Exception as e:  # noqa: BLE001 — a dead draw must not kill the scan
            # some draws are unusable BY CONSTRUCTION, same as the reference:
            # star components have n+1 nodes, the planting zip truncates
            # (prepare_dataset.py:502-504), and the orphan node can merge
            # with a base node into a self-loop that nx.core_number rejects.
            # The reference's generator crashes identically on such draws —
            # skip the seed and keep scanning.
            print("SCAN_SKIP " + json.dumps(
                {"seed": s, "error": f"{type(e).__name__}: {e}"[:200]}),
                flush=True)
            shutil.rmtree(d, ignore_errors=True)
            continue
        row = dict(seed=s, task=d.name, **oracle_ceiling(d, args.property))
        rows.append(row)
        print(json.dumps(row), flush=True)

    # rank on the VAL ceiling only (test ceiling is reported, never used
    # for selection), so instance choice does not condition on the same
    # test split the "beats paper" protocol is later scored on
    rows.sort(key=lambda r: (r["oracle_val_acc"], r["seed"]), reverse=True)
    print("SCAN_RANKED " + json.dumps(rows))
    keep = {r["task"] for r in rows[:args.keep_top]}
    if not args.keep_all:
        for r in rows[args.keep_top:]:
            d = root / r["task"]
            # only GRAPH-ONLY candidates are disposable — a dir that has
            # been fully prepared (embeddings trained, possibly hours of
            # downstream artifacts) must never be silently rmtree'd by a
            # wider re-scan that ranks a new seed above it
            if any(d.glob("*_embeddings.*")):
                print(f"keeping prepared instance {d} (not graph-only)")
                continue
            shutil.rmtree(d, ignore_errors=True)
    print("SCAN_FINAL " + json.dumps(
        {"winners": [r for r in rows[:args.keep_top]], "kept": sorted(keep),
         "ceiling_span": [rows[-1]["oracle_test_acc"],
                          rows[0]["oracle_test_acc"]]}))


if __name__ == "__main__":
    main()
