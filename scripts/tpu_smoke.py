"""Real-TPU hardware smoke: validate the Pallas lowerings and the fused
trainer on the actual chip (the pytest suite pins everything to a virtual
CPU mesh where Pallas runs in interpret mode — tests/conftest.py — so this
is the only automated check of the real TPU compilation path outside
bench/protocol runs).

Checks, each vs an on-device XLA/lax reference:
  1. Pallas batched exact DTW (ops/dtw_pallas.py) vs the lax.scan
     wavefront DTW (precompute/dtw.py) — allclose.
  2. Pallas plan-routed embedding backward (ops/embedding.py
     _segment_matmul_pallas) vs the XLA one-hot fallback — allclose.
  3. One fused Trainer.fit epoch on the chip — finite loss.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_smoke.py
Prints one JSON line; exits nonzero on any failure.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def check_dtw():
    import jax.numpy as jnp
    from subgnn_tpu.precompute.dtw import dtw_distance_batch
    from subgnn_tpu.ops.dtw_pallas import dtw_distance_pallas
    rng = np.random.default_rng(0)
    N, L = 64, 32
    a = jnp.asarray(rng.integers(0, 20, (N, L)).astype(np.float32))
    la = jnp.asarray(rng.integers(1, L + 1, (N,)).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 20, (N, L)).astype(np.float32))
    lb = jnp.asarray(rng.integers(1, L + 1, (N,)).astype(np.int32))
    import jax
    interp = jax.devices()[0].platform != "tpu"   # CPU sanity runs interpret
    got = np.asarray(dtw_distance_pallas(a, la, b, lb, interpret=interp))
    ref = np.asarray(dtw_distance_batch(a, la, b, lb))
    err = float(np.max(np.abs(got - ref)))
    assert err < 1e-3, f"pallas DTW vs scan DTW max err {err}"
    return err


def check_plan_backward():
    import jax
    import jax.numpy as jnp
    from subgnn_tpu.ops.embedding import (make_gather_plan,
                                          _segment_matmul_pallas,
                                          _segment_matmul_xla)
    if jax.devices()[0].platform != "tpu":
        return None  # the Pallas kernel has no interpret path; TPU-only
    rng = np.random.default_rng(1)
    n_rows, D, n_ids = 1024, 128, 5000
    ids = rng.integers(0, n_rows, n_ids)
    plan = make_gather_plan(ids, n_rows)
    g = jnp.asarray(rng.normal(size=(n_ids + 1, D)).astype(np.float32))
    g = g.at[-1].set(0)
    got = np.asarray(_segment_matmul_pallas(g, plan, jnp.float32))
    ref = np.asarray(_segment_matmul_xla(g, plan, jnp.float32))
    err = float(np.max(np.abs(got - ref)))
    assert err < 1e-3, f"pallas plan backward vs XLA max err {err}"
    return err


def check_fused_epoch():
    import __graft_entry__ as ge
    from subgnn_tpu.train.loop import Trainer
    model, hp, params, state, data, anchors, eval_cc = \
        ge._build_training_fixture(n_train=64, n_val=16, n_nodes=1024,
                                   hp_overrides=dict(batch_size=32,
                                                     max_epochs=2))
    tr = Trainer(model, hp, eval_cc_tables=eval_cc)
    tr.fit(params, state, data["train"], data["val"], anchors,
           seed=0, log_fn=None)
    assert hasattr(tr, "_fused_train_epoch"), "fused mode did not engage"
    loss = tr.metric_scores[-1]["train_loss"]
    assert np.isfinite(loss), loss
    return float(loss)


def main():
    import jax
    platform = jax.devices()[0].platform
    t0 = time.time()
    out = {"platform": platform,
           "dtw_pallas_max_err": check_dtw(),
           "plan_backward_max_err": check_plan_backward(),
           "fused_epoch_train_loss": check_fused_epoch(),
           "wall_s": round(time.time() - t0, 1),
           "ok": True}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
