"""One-command real-dataset reproduction harness (VERDICT r2 task 5).

The reference's headline workflow (train_config.py:216-231, README.md:42-55)
runs the four released datasets — PPI-BP / HPO-METAB / HPO-NEURO / EM-USER —
with the frozen winning hyperparameters
(best_model_hyperparameters/<task>/hyperparams.json) and the 10-seed
test.py protocol. Those datasets are not in this environment (zero
egress), so this script turns dataset availability into a zero-effort
reproduction: drop the reference-format directories under data/ as

    data/ppi_bp/{edge_list.txt, subgraphs.pth, gin_embeddings.pth, ...}
    data/hpo_metab/..., data/hpo_neuro/..., data/em_user/...

and run

    PYTHONPATH=/root/repo python scripts/reproduce_real.py

Per task it (1) validates the on-disk files and loaders, (2) lets the
pipeline fill any missing precompute artifacts (shortest-path matrix /
similarities are computed and cached on first run; at >20k nodes the
runner uses source-subset BFS rows instead of the n^2 matrix), (3) runs
the 10-seed protocol with the reference's frozen hyperparameters loaded
unchanged, and (4) prints the comparison table against the paper's
numbers (arXiv:2006.10538 Table 2, as recalled). Tasks with missing
files are reported and skipped, so the command is safe to run
unattended with any subset of the four datasets present.

`-mini` dry-runs the full harness on the checked-in reference-format
miniature fixture (tests/fixtures/mini_multilabel) — the CI gate that
proves the harness executes end-to-end without the real data
(tests/test_mini_fixture_e2e.py::test_reproduce_real_harness_dry_run).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os
REF = Path(os.environ.get("SUBGNN_REF_HPARAMS",
                          "/root/reference/best_model_hyperparameters"))
# task dir -> (display name, paper micro-F1 mean, paper sd)
PAPER = {
    "ppi_bp": ("PPI-BP", 0.599, 0.008),
    "hpo_metab": ("HPO-METAB", 0.537, 0.023),
    "hpo_neuro": ("HPO-NEURO", 0.644, 0.019),
    "em_user": ("EM-USER", 0.816, 0.040),
}
REQUIRED = ("edge_list.txt", "subgraphs.pth")


def validate_task(task_dir: Path, hyp: dict) -> list[str]:
    """Check files + loaders; return a list of problems (empty = ok)."""
    problems = [f"missing {f}" for f in REQUIRED
                if not (task_dir / f).exists()]
    emb_name = ("gin_embeddings.pth" if hyp.get("embedding_type", "gin")
                == "gin" else "graphsaint_gcn_embeddings.pth")
    emb_path = task_dir / emb_name
    if not emb_path.exists() and not emb_path.with_suffix(".npy").exists():
        problems.append(f"missing {emb_name}")
    if problems:
        return problems
    # loader validation: parse everything and cross-check shapes
    from subgnn_tpu.data.graph import CSRGraph
    from subgnn_tpu.data.subgraphs import read_subgraphs
    from subgnn_tpu.train.runner import load_embeddings
    try:
        graph = CSRGraph.from_edgelist(task_dir / "edge_list.txt")
    except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
        return [f"edge_list.txt unreadable: {e}"]
    try:
        tr, _, va, _, te, _, multilabel = read_subgraphs(
            task_dir / "subgraphs.pth")
    except Exception as e:  # noqa: BLE001
        return [f"subgraphs.pth unreadable: {e}"]
    try:
        emb = load_embeddings(emb_path)
    except Exception as e:  # noqa: BLE001
        return [f"{emb_name} unreadable: {e}"]
    if emb.shape[0] < graph.n_nodes:
        problems.append(f"embeddings rows {emb.shape[0]} < n_nodes "
                        f"{graph.n_nodes}")
    n_sub = len(tr) + len(va) + len(te)
    print(f"  loaders ok: {graph.n_nodes} nodes, "
          f"{len(graph.indices) // 2} edges, "
          f"{n_sub} subgraphs (multilabel={multilabel}), "
          f"embeddings {tuple(emb.shape)}", flush=True)
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-tasks", default="ppi_bp,hpo_metab,hpo_neuro,em_user")
    ap.add_argument("-project_root", default="data")
    ap.add_argument("-n_seeds", type=int, default=10)
    ap.add_argument("-max_epochs", type=int, default=None,
                    help="override the frozen configs' epoch budget")
    ap.add_argument("-cpu", action="store_true",
                    help="pin jax to CPU (default: ambient platform, i.e. "
                         "the TPU when the tunnel is up)")
    ap.add_argument("-mini", action="store_true",
                    help="dry-run the harness on the checked-in miniature "
                         "reference-format fixture (no real data needed)")
    args = ap.parse_args()

    import jax
    if args.cpu or args.mini:
        jax.config.update("jax_platforms", "cpu")
    from subgnn_tpu.cli.test import run_seeds

    if args.mini:
        import shutil
        import tempfile
        fixture = REPO / "tests" / "fixtures" / "mini_multilabel" / "mini"
        tmp = Path(tempfile.mkdtemp(prefix="repro_mini_"))
        shutil.copytree(fixture, tmp / "mini")
        cfg = dict(json.loads(
            (REF / "ppi_bp" / "hyperparams.json").read_text()),
            max_epochs=2, batch_size=4, n_anchor_patches_structure=4,
            n_anchor_patches_pos_in=2, n_anchor_patches_pos_out=4,
            n_anchor_patches_N_in=2, n_anchor_patches_N_out=2,
            n_triangular_walks=2, node_embed_size=8)
        cfg_path = tmp / "mini_hyperparams.json"
        cfg_path.write_text(json.dumps(cfg))
        tasks, root, n_seeds = ["mini"], tmp, 2
        configs = {"mini": cfg_path}
        paper = {"mini": ("MINI-FIXTURE", float("nan"), float("nan"))}
    else:
        tasks = [t.strip() for t in args.tasks.split(",")]
        unknown = [t for t in tasks if t not in PAPER]
        for t in unknown:  # report + skip, never crash an unattended run
            print(f"SKIP unknown task {t!r} (known: {', '.join(PAPER)})",
                  flush=True)
        tasks = [t for t in tasks if t in PAPER]
        root = Path(args.project_root)
        n_seeds = args.n_seeds
        configs = {t: REF / t / "hyperparams.json" for t in tasks}
        paper = PAPER

    rows = []
    for task in tasks:
        name, p_mean, p_sd = paper[task]
        task_dir = root / task
        print(f"== {name} ({task_dir})", flush=True)
        if not task_dir.exists():
            print(f"  SKIP: {task_dir} not present (drop the reference-"
                  "format dataset there to include it)", flush=True)
            rows.append((name, None, p_mean, p_sd, "not present"))
            continue
        hyp = json.loads(Path(configs[task]).read_text())
        problems = validate_task(task_dir, hyp)
        if problems:
            print("  SKIP: " + "; ".join(problems), flush=True)
            rows.append((name, None, p_mean, p_sd, "; ".join(problems)))
            continue
        r = run_seeds(task, str(root), str(configs[task]), n_seeds=n_seeds,
                      out_dir=str(root / "results" /
                                  f"{task}_frozen_{n_seeds}seeds"),
                      max_epochs=args.max_epochs,
                      log_fn=lambda m: print(f"  {m}", flush=True)
                      if m.startswith("seed") else None)
        rows.append((name, r, p_mean, p_sd, ""))

    print("\n| Task | ours (micro-F1, {}-seed) | paper | delta |".format(
        n_seeds))
    print("|---|---|---|---|")
    for name, r, p_mean, p_sd, note in rows:
        if r is None:
            print(f"| {name} | SKIPPED ({note}) | "
                  f"{p_mean:.3f} +/- {p_sd:.3f} | — |")
        else:
            d = r["micro_f1_mean"] - p_mean
            print(f"| {name} | {r['micro_f1_mean']:.3f} +/- "
                  f"{r['micro_f1_sd']:.3f} | {p_mean:.3f} +/- {p_sd:.3f} | "
                  f"{d:+.3f} |")
    print(json.dumps({"harness": "reproduce_real",
                      "ran": [n for n, r, *_ in rows if r is not None],
                      "skipped": [n for n, r, *_ in rows if r is None]}))


if __name__ == "__main__":
    main()
