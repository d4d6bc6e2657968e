#!/bin/bash
# Round-4 TPU queue #15: EM-USER dress rehearsal (session restart of
# queue13 — data/ was wiped before it could run). The two prior attempts
# OOM'd: first on whole-array SpMM messages (fixed: chunked SpMM), then
# on the padded neighbor table (57k-node graph with a 36k-degree hub =
# 7.8 GB; fixed: GraphSAINT walker now walks the flat CSR arrays, commit
# dfb3c21). No predecessor on the chip this session.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

python -u scripts/make_real_standins.py --emb -emb_epochs 10 -tasks em_user
time python -u scripts/reproduce_real.py -n_seeds 10 -tasks em_user
echo "=== ROUND4 QUEUE15 DONE ($(date)) ==="
