"""Host-side GatherPlan construction for training batches.

The model's embedding-table lookups (cc-id init + the per-layer
neighborhood anchor gathers, reference: SubGNN/SubGNN.py:609-622 and
anchor_patch_samplers.py:352-364) are routed through
ops/embedding.embedding_gather when the batch carries matching plans,
turning the backward scatter-add into blocked MXU matmuls. Anchor ids and
the epoch's batch schedule are both host-known before dispatch, so plans
are built here in numpy and shipped with the batch (stacked per epoch for
the fused lax.scan trainer).

Plan widths must be static for XLA: a PlanBuilder remembers the width per
plan name and only grows it (in 128-row steps) when a batch's densest
table block exceeds it — one extra compile per growth, stable thereafter.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..ops.embedding import (GatherPlan, TABLE_BLOCK, make_gather_plan,
                             plan_width_for)


def neigh_ids_for_batch(anchors, idx: np.ndarray) -> np.ndarray:
    """(L, B, C, A_in+A_out) ids exactly as the forward consumes them
    (models/subgnn.py n_ids_all: internal then border along the last
    axis)."""
    n_int = np.asarray(anchors["neigh_int"])
    n_bor = np.asarray(anchors["neigh_bor"])
    return np.concatenate([n_int[:, idx], n_bor[:, idx]], axis=-1)


class PlanBuilder:
    """Builds per-batch plans with sticky, growth-only widths."""

    def __init__(self, n_rows: int):
        self.n_rows = int(n_rows)
        self.widths: Dict[str, int] = {}

    def _width(self, name: str, flat: np.ndarray) -> int:
        n_blocks = -(-self.n_rows // TABLE_BLOCK)
        counts = np.bincount(flat // TABLE_BLOCK, minlength=n_blocks)
        need = int(counts.max()) if flat.size else 1
        prev = self.widths.get(name, 0)
        base = plan_width_for(flat.size, self.n_rows)
        if need > max(prev, base):
            # growing past the estimate: add 25% headroom so shuffle-to-
            # shuffle variation doesn't trigger a recompile every epoch
            need = int(need * 1.25)
        w = max(prev, base, -(-need // 128) * 128)
        self.widths[name] = w
        return w

    def build(self, name: str, ids: np.ndarray) -> GatherPlan:
        flat = np.asarray(ids, np.int64).reshape(-1)
        return make_gather_plan(ids, self.n_rows,
                                width=self._width(name, flat))

    def build_stacked(self, name: str, ids_per_batch) -> GatherPlan:
        """One plan per batch, all with a common width, stacked along a
        leading axis (for lax.scan)."""
        import jax.numpy as jnp
        flats = [np.asarray(i, np.int64).reshape(-1) for i in ids_per_batch]
        w = max(self._width(name, f) for f in flats)
        self.widths[name] = w
        plans = [make_gather_plan(i, self.n_rows, width=w)
                 for i in ids_per_batch]
        return GatherPlan(jnp.stack([p.pos for p in plans]),
                          jnp.stack([p.local_row for p in plans]),
                          self.n_rows)


def epoch_plans(builder: Optional[PlanBuilder], hp, cc_ids: np.ndarray,
                anchors, order: np.ndarray) -> Dict[str, GatherPlan]:
    """Stacked plans for every batch of an epoch schedule `order`
    ((n_batches, B) subgraph indices). Keys match the batch-dict names the
    model forward reads."""
    if builder is None:
        return {}
    cc_np = np.asarray(cc_ids)
    plans = {"cc_plan": builder.build_stacked(
        "cc", [cc_np[idx] for idx in order])}
    if hp.use_neighborhood:
        plans["neigh_plan"] = builder.build_stacked(
            "neigh", [neigh_ids_for_batch(anchors, idx) for idx in order])
    return plans


def batch_plans(builder: Optional[PlanBuilder], hp, batch_cc_ids: np.ndarray,
                anchors, idx: np.ndarray) -> Dict[str, GatherPlan]:
    """Plans for a single batch (streaming / single-step mode).
    batch_cc_ids is the batch's OWN (B, C, L) id array so padded short-batch
    rows match the device-side gather exactly."""
    if builder is None:
        return {}
    plans = {"cc_plan": builder.build("cc", np.asarray(batch_cc_ids))}
    if hp.use_neighborhood:
        plans["neigh_plan"] = builder.build(
            "neigh", neigh_ids_for_batch(anchors, idx))
    return plans
