#!/bin/bash
# Round-2 queue 16: consolidated sequential re-run of the jobs broken by
# the pid-parsing bug (q11-q15 waited on wrong PIDs; q12/q13 ran
# concurrently with q10 and crashed/measured garbage). One queue, strictly
# sequential, chip assumed free at launch.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== JOB 1: bench median-of-3 + compact sims (verify) ($(date)) ==="
python -u bench.py
echo "=== JOB 2: bench NO compact (A/B) ($(date)) ==="
BENCH_NO_COMPACT=1 python -u bench.py
echo "=== JOB 3: bench compact bf16 ($(date)) ==="
BENCH_DTYPE=bfloat16 python -u bench.py
echo "=== JOB 4: tpu pallas smoke ($(date)) ==="
python -u scripts/tpu_smoke.py
echo "=== JOB 5: gather ceiling ($(date)) ==="
python -u scripts/bench_gather_ceiling.py
echo "=== JOB 6: PPI-BP structure sims re-measure (on-device DTW) ($(date)) ==="
rm -f data/scale17k_ppi/similarities/int_struc_* data/scale17k_ppi/similarities/bor_struc_*
python -u - <<'PY'
import time, json
from subgnn_tpu.config import RunConfig
from subgnn_tpu.train.runner import SubGNNPipeline, load_best_hyperparams
hp = load_best_hyperparams('/root/reference/best_model_hyperparameters/ppi_bp/hyperparams.json')
rc = RunConfig(task='scale17k_ppi', project_root='data')
pipe = SubGNNPipeline(rc, hp)
pipe.load()
t0 = time.time()
pipe.precompute()
print(json.dumps({"precompute_s_after_ondevice_dtw": round(time.time()-t0, 1)}))
PY
echo "=== JOB 7: 100k-node / 1000-subgraph pipeline ($(date)) ==="
python -u scripts/stress_scale.py -task scale100k -n 100000 \
  -n_subgraphs 1000 -epochs 10
echo "=== QUEUE16 DONE ($(date)) ==="
