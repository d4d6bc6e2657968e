"""Quantify the exact-DTW vs fastdtw(radius=1) deviation (PARITY.md).

The reference computes structure similarities with the approximate fastdtw
package (reference: SubGNN/gamma.py:54-59); our kernel computes exact DTW
(subgnn_tpu/precompute/dtw.py). This script measures, on a real dataset's
degree sequences:

  1. the distribution of |exact - fastdtw| per pair, in raw-distance and in
     the 1/(d+1) similarity space the model consumes, and
  2. the end-metric delta: two identical seed-0 CPU training runs on copies
     of the dataset whose cached structure-similarity matrices were computed
     with exact DTW vs with fastdtw.

Usage: PYTHONPATH=/root/repo python scripts/dtw_deviation_study.py \
           [-task density] [-epochs 30]
"""
from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

from subgnn_tpu.data.graph import CSRGraph                        # noqa: E402
from subgnn_tpu.data.subgraphs import read_subgraphs, reindex_subgraphs  # noqa: E402
from subgnn_tpu.data.dataset import initialize_cc_ids             # noqa: E402
from subgnn_tpu.precompute.degree import degree_sequences         # noqa: E402
from subgnn_tpu.precompute.dtw import dtw_host                    # noqa: E402
from tests.fastdtw_ref import fastdtw                             # noqa: E402


def ratio_dist(a, b):
    return (max(a, b) + 1.0) / (min(a, b) + 1.0) - 1.0


def seq_rows(seqs, lens):
    return [tuple(seqs[i, :lens[i]].tolist()) for i in range(len(lens))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-task", default="density")
    ap.add_argument("-project_root", default=str(REPO / "data"))
    ap.add_argument("-epochs", type=int, default=30)
    ap.add_argument("-skip_train", action="store_true")
    args = ap.parse_args()

    ddir = Path(args.project_root) / args.task
    graph = CSRGraph.from_edgelist(ddir / "edge_list.txt")
    tr, _, va, _, te, _, _ = read_subgraphs(ddir / "subgraphs.pth")
    splits = {"train": reindex_subgraphs(tr), "val": reindex_subgraphs(va),
              "test": reindex_subgraphs(te)}
    anchors = None
    for p in sorted((ddir / "similarities").glob("struc_patches_*.npy")):
        anchors = np.load(p).astype(np.int32)
    assert anchors is not None, "no cached structure anchor patches"

    # ---- pairwise deviation over every (non-empty CC, anchor) pair --------
    memo = {}

    def approx_dtw(ca, cb):
        key = (ca, cb)
        if key not in memo:
            memo[key] = fastdtw(ca, cb, dist=ratio_dist)[0]
        return memo[key]

    stats = {}
    sim_overrides = {}  # (internal, split) -> fastdtw sim matrix
    t0 = time.time()
    for internal in (True, False):
        a_seqs, a_lens = degree_sequences(graph, anchors, internal=internal)
        a_rows = seq_rows(a_seqs, a_lens)
        gaps_d, gaps_s, n_exact = [], [], 0
        for split, subs in splits.items():
            cc_ids = initialize_cc_ids(graph, subs)
            n_sub, max_cc, L = cc_ids.shape
            c_seqs, c_lens = degree_sequences(
                graph, cc_ids.reshape(-1, L), internal=internal)
            c_rows = seq_rows(c_seqs, c_lens)
            sims = np.zeros((n_sub * max_cc, len(a_rows)), np.float32)
            pair_memo = {}
            for ci, crow in enumerate(c_rows):
                if not crow:
                    continue
                for ai, arow in enumerate(a_rows):
                    if not arow:
                        continue
                    key = (crow, arow)
                    if key not in pair_memo:
                        ap_d = approx_dtw(crow, arow)
                        ex_d = dtw_host(crow, arow)
                        pair_memo[key] = (ex_d, ap_d)
                        gaps_d.append(ap_d - ex_d)
                        gaps_s.append(abs(1 / (ex_d + 1) - 1 / (ap_d + 1)))
                        n_exact += ap_d - ex_d < 1e-12
                    sims[ci, ai] = 1.0 / (pair_memo[key][1] + 1.0)
            sims = sims.reshape(n_sub, max_cc, -1)
            sims[cc_ids[:, :, 0] == 0] = 0.0
            sim_overrides[(internal, split)] = sims
        gd, gs = np.asarray(gaps_d), np.asarray(gaps_s)
        stats["internal" if internal else "border"] = {
            "unique_pairs": int(len(gd)),
            "frac_identical": float(n_exact / len(gd)),
            "dist_gap_mean": float(gd.mean()),
            "dist_gap_p99": float(np.percentile(gd, 99)),
            "dist_gap_max": float(gd.max()),
            "sim_gap_mean": float(gs.mean()),
            "sim_gap_max": float(gs.max()),
        }
    print(json.dumps(stats, indent=2))
    print(f"[deviation] pair sweep in {time.time() - t0:.1f}s", flush=True)

    if args.skip_train:
        return

    # ---- end-metric delta: exact-sims run vs fastdtw-sims run -------------
    results = {}
    for variant in ("exact", "fastdtw"):
        root = Path("/tmp/dtw_study") / variant
        dst = root / args.task
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(ddir, dst)
        if variant == "fastdtw":
            n_over = 0
            for p in (dst / "similarities").glob("*_struc_*_similarities.npy"):
                internal = p.name.startswith("int_")
                split = p.name.rsplit("_", 1)[0].rsplit("_", 1)[-1]
                key = (internal, split)
                assert key in sim_overrides, p.name
                np.save(p, sim_overrides[key])
                n_over += 1
            assert n_over == 6, n_over
        cmd = [sys.executable, "-c", (
            "import sys, jax; jax.config.update('jax_platforms','cpu');"
            f"sys.argv=['train','-task','{args.task}','-project_root','{root}',"
            f"'-tb_dir','/tmp/dtw_study/tb_{variant}','-tb_name','v',"
            f"'-max_epochs','{args.epochs}','-seed','0'];"
            "from subgnn_tpu.cli.train import main; main()")]
        t1 = time.time()
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=str(REPO), env={"PYTHONPATH": str(REPO),
                                                 "PATH": "/usr/bin:/bin",
                                                 "HOME": "/root"})
        tail = [l for l in out.stdout.strip().splitlines() if l.strip()]
        metrics = json.loads(tail[-1]) if tail else {}
        results[variant] = metrics.get("test", metrics)
        print(f"[{variant}] {time.time() - t1:.0f}s -> {tail[-1] if tail else out.stderr[-500:]}",
              flush=True)
    print(json.dumps({"end_metric_delta": {
        k: {m: results["exact"].get(m, 0) - results["fastdtw"].get(m, 0)
            for m in ("test_micro_f1", "test_acc", "test_auroc")
            if m in results["exact"]}
        for k in ["exact_minus_fastdtw"]}}, indent=2))


if __name__ == "__main__":
    main()
