#!/bin/bash
# Round-2 queue 10: real-task frozen-config stress runs at real-dataset scale.
#  JOB 1: EM-USER frozen winner (N-only, trainable_cc, 200 epochs, bs 32)
#         on the 57k-node instance (fresh 128-dim GraphSAINT embeddings).
#  JOB 2: PPI-BP frozen winner (S-only, 4 layers, 200 epochs, bs 32)
#         on a fresh 17k-node / 1600-subgraph instance (PPI-BP shape).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== JOB 1: EM-USER frozen config at 57k ($(date)) ==="
python -u scripts/stress_scale.py -task scale57k_ref -n 57000 \
  -n_subgraphs 320 -emb_dim 128 \
  -ref_hparams /root/reference/best_model_hyperparameters/em_user/hyperparams.json

echo "=== JOB 2: PPI-BP frozen config at 17k x 1600 ($(date)) ==="
python -u scripts/stress_scale.py -task scale17k_ppi -n 17000 \
  -n_subgraphs 1600 -emb_dim 64 \
  -ref_hparams /root/reference/best_model_hyperparameters/ppi_bp/hyperparams.json

echo "=== QUEUE10 DONE ($(date)) ==="
