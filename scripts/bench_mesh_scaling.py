"""Mesh-scaling check of the PRODUCTION fused-epoch Trainer on a virtual
CPU device mesh (xla_force_host_platform_device_count).

Multi-chip TPU hardware is not reachable from this environment (one v5e
chip behind a tunnel), so this measures the only thing a virtual mesh can
honestly measure: that the mesh-native Trainer path (sharded params,
'data'-sharded epoch schedules, GatherPlans, psum'd grads) compiles, runs,
and does not collapse under sharding — per-epoch wall time should stay
roughly flat as devices increase at fixed GLOBAL batch (weak scaling of
per-device work; this host has few physical cores, so speedups are bounded
by core count, and XLA:CPU collectives are not representative of ICI).

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH=/root/repo python scripts/bench_mesh_scaling.py

Prints one JSON line per mesh size plus a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def run(n_data: int, n_node: int, epochs: int = 6) -> dict:
    import __graft_entry__ as ge
    from subgnn_tpu.train.loop import Trainer, mpn_edges_per_step

    model, hp, params, state, data, anchors, eval_cc = \
        ge._build_training_fixture(
            n_train=256, n_val=32, n_nodes=2048,
            hp_overrides=dict(batch_size=64, max_epochs=epochs,
                              node_embed_size=64, n_layers=2,
                              mesh_data_axis=n_data,
                              mesh_node_axis=n_node))
    tr = Trainer(model, hp, eval_cc_tables=eval_cc)
    t0 = time.time()
    tr.fit(params, state, data["train"], data["val"], anchors,
           seed=0, log_fn=None)
    total = time.time() - t0
    assert hasattr(tr, "_fused_train_epoch"), "fused mode did not engage"
    # first epoch pays compile; steady state = median of the rest
    times = [m["epoch_time_s"] for m in tr.metric_scores]
    steady = float(np.median(times[1:]))
    edges = mpn_edges_per_step(hp, hp.batch_size, data["train"].cc_ids.shape[1])
    n_steps = len(data["train"]) // hp.batch_size
    out = {
        "mesh": {"data": n_data, "node": n_node},
        "steady_epoch_s": round(steady, 4),
        "edges_per_s": round(edges * n_steps / steady, 1),
        "compile_epoch_s": round(times[0], 2),
        "final_train_loss": round(tr.metric_scores[-1]["train_loss"], 6),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    results = [run(1, 1), run(2, 1), run(4, 1), run(2, 2), run(4, 2)]
    base = results[0]
    summary = {
        "metric": "fused_trainer_mesh_scaling",
        "host_cores": os.cpu_count(),
        "rel_epoch_time": {f"data{r['mesh']['data']}xnode{r['mesh']['node']}":
                           round(r["steady_epoch_s"] / base["steady_epoch_s"], 3)
                           for r in results},
        "loss_agreement": max(abs(r["final_train_loss"]
                                  - base["final_train_loss"])
                              for r in results[1:]),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
