#!/bin/bash
# Round-2 queue 15: re-measure the PPI-BP-scale structure-sims precompute
# after the on-device DTW pair loop (was 203.3s dispatch-bound).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "=== JOB 1: scale17k_ppi structure sims fresh ($(date)) ==="
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
echo "=== QUEUE15 DONE ($(date)) ==="
