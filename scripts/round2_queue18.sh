#!/bin/bash
# Round-2 queue 18: 100k diagnosis + full pipeline retry after the
# project-first node-emb change. Waits for queue17 (bare pid).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 60; done

echo "=== JOB 1: node-emb solo at 100k, short run ($(date)) ==="
python -u - <<'PY'
import time, json
from subgnn_tpu.data.graph import CSRGraph
from subgnn_tpu.prepare.node_emb import train_node_embeddings
g = CSRGraph.from_edgelist('data/scale100k/edge_list.txt')
t0 = time.time()
emb, m = train_node_embeddings(g, epochs=8, seed=0, minibatch='graphsaint')
print(json.dumps({"n": g.n_nodes, "s": round(time.time()-t0,1),
                  **{k: round(v,4) for k, v in m.items()}}))
PY

echo "=== JOB 2: full 100k pipeline ($(date)) ==="
python -u scripts/stress_scale.py -task scale100k -n 100000 \
  -n_subgraphs 1000 -epochs 10

echo "=== QUEUE18 DONE ($(date)) ==="
