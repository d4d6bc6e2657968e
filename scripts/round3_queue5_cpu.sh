#!/bin/bash
# Round-3 CPU queue #5 (post-reboot regeneration).
# The driver's between-session clean wipes gitignored paths (data/, logs/,
# *.so) — queue4's seed-averaged-search results were lost before harvest.
# This queue (a) regenerates the synthetic datasets the gated tests and
# studies need, (b) re-runs the two lost searches. All generation is
# seeded, so the datasets are byte-stable reproductions.
# HARVEST RULE: copy FINAL lines into RESULTS.md (tracked) as soon as they
# appear; nothing under data/ or logs/ survives a session boundary.
set -x
cd /root/repo
export PYTHONPATH=/root/repo

python -u - <<'EOF'
from pathlib import Path
import shutil
import jax
jax.config.update("jax_platforms", "cpu")
from subgnn_tpu.cli.prepare_dataset import prepare
from subgnn_tpu.data.graph import CSRGraph
from subgnn_tpu.prepare.node_emb import save_embeddings, train_node_embeddings

root = Path("data")
# data/density gates tests/test_parallel.py::test_pipeline_precompute_takes_mesh
for task in ("density", "density250"):
    d = root / task
    if not (d / "subgraphs.pth").exists():
        print(f"== preparing {task} ==", flush=True)
        prepare(d, "density", seed=42, conv="gin", emb_dim=64,
                emb_epochs=100, n=1000, n_subgraphs=250, n_subgraph_nodes=20)

# the emb80s43 embedding draw (best CPU draw in the sensitivity scan)
GRAPH_FILES = ("edge_list.txt", "subgraphs.pth", "shortest_path_matrix.npy",
               "degree_sequence.txt", "ego_graphs.txt")
vdir = root / "density250_emb80s43"
if not (vdir / "gin_embeddings.npy").exists():
    print("== regenerating density250_emb80s43 ==", flush=True)
    vdir.mkdir(parents=True, exist_ok=True)
    for f in GRAPH_FILES:
        src = root / "density250" / f
        if src.exists():
            shutil.copy(src, vdir / f)
    sim = root / "density250" / "similarities"
    if sim.exists() and not (vdir / "similarities").exists():
        shutil.copytree(sim, vdir / "similarities")
    g = CSRGraph.from_edgelist(vdir / "edge_list.txt")
    emb, m = train_node_embeddings(g, conv_type="gin", out_dim=64,
                                   epochs=80, seed=43)
    save_embeddings(vdir, emb, "gin")
    print({"emb_val_auc": m["val_auc"], "emb_test_auc": m["test_auc"]},
          flush=True)
EOF

# lost queue4 searches, re-run verbatim (cutratio auto-prepares its data)
python -u scripts/seed_avg_search.py -task cutratio250 -property cut_ratio -channels S -trials 40 -hpo_seeds 2 -search_epochs 150
python -u scripts/seed_avg_search.py -task density250_emb80s43 -property density -channels S -trials 25 -hpo_seeds 2 -search_epochs 150
echo "=== ROUND3 QUEUE5 DONE ($(date)) ==="
