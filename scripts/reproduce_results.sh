#!/bin/bash
# Regenerate every RESULTS.md row from scratch (instance generation -> HPO ->
# multi-seed retest -> oracles -> throughput). Each block is the exact
# command that produced the corresponding RESULTS.md row; run the whole file
# (~6-8 h on one v5e behind the axon tunnel) or any block alone.
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash scripts/reproduce_results.sh
#
# Datasets are regenerated only if missing (delete data/<task> to force).
set -ex
cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}

# ---- frozen reference hyperparams on small instances (RESULTS "Quality") --
python -u scripts/reproduce_synthetics.py --hyperparams S --seeds 5
python -u scripts/reproduce_synthetics.py --hyperparams all --seeds 1

# ---- 250-instance full protocol (HPO + 10-seed retest) -------------------
python -u scripts/run_synthetic_protocol.py -property cc -task component250 \
  -n_subgraphs 250 -trials 15 -seeds 5
python -u scripts/run_synthetic_protocol.py -property density -task density250 \
  -n_subgraphs 250 -trials 40 -seeds 10 -sampler tpe
python -u scripts/run_synthetic_protocol.py -property cut_ratio -task cutratio250 \
  -n_subgraphs 250 -trials 45 -seeds 10 -sampler tpe -search_channels
python -u scripts/run_synthetic_protocol.py -property coreness -task coreness5k \
  -n 5000 -n_subgraphs 250 -trials 40 -seeds 10 -sampler tpe

# ---- round-2 deep-space protocol (reference winning region) --------------
python -u scripts/run_synthetic_protocol.py -property cut_ratio -task cutratio250 \
  -n_subgraphs 250 -trials 40 -seeds 10 -sampler tpe -channels S -deep
python -u scripts/run_synthetic_protocol.py -property density -task density250 \
  -n_subgraphs 250 -trials 40 -seeds 10 -sampler tpe -deep
python -u scripts/run_synthetic_protocol.py -property cc -task component250 \
  -n_subgraphs 250 -trials 40 -seeds 10 -sampler tpe -deep

# ---- reference-frozen-config controls on the 250 instances ---------------
# (the "frozen-ref" rows: what the reference's own winning configs score
# on OUR instances — the instance-ceiling argument in RESULTS.md)
REF=/root/reference/best_model_hyperparameters
python -u -c "
from subgnn_tpu.cli.test import run_seeds
run_seeds('cutratio250', 'data',
          '$REF/cutratio/S_cutratio_hyperparams.json',
          n_seeds=10, out_dir='data/results/cutratio250_Sref_10seeds')
run_seeds('density250', 'data',
          '$REF/density/S_density_hyperparams.json',
          n_seeds=10, out_dir='data/results/density250_Sref_10seeds')
run_seeds('density250', 'data',
          '$REF/density/all_density_hyperparams.json',
          n_seeds=10, out_dir='data/results/density250_ALLref_10seeds')
run_seeds('component250', 'data',
          '$REF/component/all_component_hyperparams.json',
          n_seeds=10, out_dir='data/results/component250_ALLref_10seeds')
# the 500-epoch rows (frozen configs, only max_epochs raised; top-k val
# checkpointing makes the longer budget monotone-safe — RESULTS.md)
run_seeds('component250', 'data',
          '$REF/component/all_component_hyperparams.json', n_seeds=10,
          max_epochs=500,
          out_dir='data/results/component250_ALLref_500ep_10seeds')
# per-channel frozen component configs (P is the winner: component count
# is a position property — RESULTS.md)
for ch in ['P', 'N', 'S']:
    run_seeds('component250', 'data',
              f'$REF/component/{ch}_component_hyperparams.json', n_seeds=10,
              max_epochs=500,
              out_dir=f'data/results/component250_{ch}ref_500ep_10seeds')
run_seeds('cutratio250', 'data',
          '$REF/cutratio/S_cutratio_hyperparams.json', n_seeds=10,
          max_epochs=500,
          out_dir='data/results/cutratio250_Sref_500ep_10seeds')
run_seeds('density250', 'data',
          '$REF/density/S_density_hyperparams.json', n_seeds=10,
          max_epochs=500,
          out_dir='data/results/density250_Sref_500ep_10seeds')
"

# ---- instance-variance controls (fresh instance draws, same frozen configs)
# (the "v2/v3/v4" rows + per-instance oracles; deterministic regeneration —
# CPU-friendly; these were produced during a TPU-tunnel outage)
python -u scripts/instance_variance_study.py \
  -tasks cutratio,density,component -seeds 43,44,45
# the component frozen-P 500-epoch controls (the winning channel config)
python -u scripts/instance_variance_study.py -tasks component_P -seeds 43,44,45
python -u scripts/instance_variance_study.py -tasks coreness5k -seeds 43,44,45

# ---- EM-USER / PPI-BP scale with the frozen reference configs ------------
python -u scripts/stress_scale.py -task scale57k_v2 -n 57000 -n_subgraphs 320
python -u scripts/stress_scale.py -task scale57k_ref -n 57000 -n_subgraphs 320 \
  -emb_dim 128 -ref_hparams $REF/em_user/hyperparams.json
python -u scripts/stress_scale.py -task scale17k_ppi -n 17000 -n_subgraphs 1600 \
  -emb_dim 64 -ref_hparams $REF/ppi_bp/hyperparams.json

# ---- instance-ceiling oracles (RESULTS "Instance-ceiling oracles") -------
for t in "density250 density" "cutratio250 cut_ratio" "coreness5k coreness" \
         "component250 cc"; do
  set -- $t
  JAX_PLATFORMS=cpu python scripts/instance_oracle.py -task "$1" -property "$2"
done

# ---- round-3 rows ----------------------------------------------------------
# density decomposition: per-channel frozen sweep + embedding-draw scan
python -u scripts/density_channel_sweep.py
python -u scripts/density_emb_sensitivity.py
# instance-ceiling scans (fresh generator draws, graph-only candidates)
JAX_PLATFORMS=cpu python -u scripts/density_instance_scan.py -seeds 46:66 -keep_top 2
JAX_PLATFORMS=cpu python -u scripts/density_instance_scan.py -property cut_ratio -seeds 46:66 -keep_top 1
JAX_PLATFORMS=cpu python -u scripts/density_instance_scan.py -property cc -task_prefix component250_s -seeds 46:66 -keep_top 1
JAX_PLATFORMS=cpu python -u scripts/density_instance_scan.py -property coreness -task_prefix coreness5k_s -n 5000 -seeds 46:58 -keep_top 1
# frozen configs on the perfect-ceiling winners (the DENSITY-closure rows).
# Self-healing: generation is seeded and deterministic, so a winner dir the
# scans above did not keep (e.g. keep_top pruned it) regenerates in-place.
python -u - <<'EOF'
from pathlib import Path
from subgnn_tpu.cli.prepare_dataset import prepare
from subgnn_tpu.cli.test import run_seeds
REF = "/root/reference/best_model_hyperparameters"
for task, seed, prop, cfg, n in [
        ("density250_s52", 52, "density",
         f"{REF}/density/S_density_hyperparams.json", 1000),
        ("density250_s50", 50, "density",
         f"{REF}/density/S_density_hyperparams.json", 1000),
        ("cutratio250_s64", 64, "cut_ratio",
         f"{REF}/cutratio/S_cutratio_hyperparams.json", 1000),
        ("coreness5k_s53", 53, "coreness", None, 5000)]:
    d = Path("data") / task
    if not (d / "gin_embeddings.npy").exists():
        prepare(d, prop, seed=seed,
                generate_graph=not (d / "subgraphs.pth").exists(),
                conv="gin", emb_dim=64, emb_epochs=100,
                n=n, n_subgraphs=250, n_subgraph_nodes=20)
    if cfg is not None:
        run_seeds(task, "data", cfg, n_seeds=10, max_epochs=500,
                  out_dir=f"data/results/{task}_Sref_500ep_10seeds")
run_seeds("coreness5k_s53", "data", "configs/best/coreness5k_hyperparams.json",
          n_seeds=10, out_dir="data/results/coreness5k_s53_hpo_10seeds")
EOF
# bf16 end-metric parity (the bench-default justification)
python -u scripts/bf16_parity_sweep.py
# sampler validation + seed-averaged searches (configs/best/*_seedavg_*)
python -u scripts/validate_tpe.py
python -u scripts/seed_avg_search.py -task cutratio250 -property cut_ratio -channels S -trials 40 -hpo_seeds 2 -search_epochs 150
python -u scripts/seed_avg_search.py -task density250_emb80s43 -property density -channels S -trials 25 -hpo_seeds 2 -search_epochs 150

# ---- throughput (RESULTS "Throughput", PERF.md) --------------------------
python bench.py
python scripts/bench_stages.py
python scripts/bench_embedding_backward.py
python scripts/bench_gather_fusion.py              # PERF.md rejected-fusion A/B
BENCH_DTYPE=bfloat16 python bench.py
JAX_PLATFORMS=cpu python bench_torch_baseline.py   # reference-style baseline

# ---- hardware / sharding validation ---------------------------------------
python scripts/tpu_smoke.py                        # real-TPU Pallas lowerings
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/bench_mesh_scaling.py             # virtual-mesh bit-exactness
python scripts/collectives_report.py               # per-step collective volumes
