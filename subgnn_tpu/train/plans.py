"""Host-side GatherPlan construction for training batches.

The model's embedding-table lookups (cc-id init + the per-layer
neighborhood anchor gathers, reference: SubGNN/SubGNN.py:609-622 and
anchor_patch_samplers.py:352-364) are routed through
ops/embedding.embedding_gather when the batch carries matching plans,
turning the backward scatter-add into blocked MXU matmuls. Anchor ids and
the epoch's batch schedule are both host-known before dispatch, so plans
are built here in numpy and shipped with the batch (stacked per epoch for
the fused lax.scan trainer).

Plan tile counts must be static for XLA: a PlanBuilder remembers the tile
count per plan name and only grows it (with headroom) when a batch needs
more — one extra compile per growth, stable thereafter. Tiling is
row-split (ops/embedding.py), so skewed id distributions (hub nodes, the
PAD row) cost extra tiles, never wider tiles.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..ops.embedding import GatherPlan, make_gather_plan, tiles_needed


def neigh_ids_for_batch(anchors, idx: np.ndarray) -> np.ndarray:
    """(L, B, C, A_in+A_out) ids exactly as the forward consumes them
    (models/subgnn.py n_ids_all: internal then border along the last
    axis)."""
    n_int = np.asarray(anchors["neigh_int"])
    n_bor = np.asarray(anchors["neigh_bor"])
    return np.concatenate([n_int[:, idx], n_bor[:, idx]], axis=-1)


class PlanBuilder:
    """Builds per-batch plans with sticky, growth-only tile counts."""

    def __init__(self, n_rows: int):
        self.n_rows = int(n_rows)
        self.tiles: Dict[str, int] = {}

    def _tiles(self, name: str, ids: np.ndarray) -> int:
        need = tiles_needed(ids, self.n_rows)
        prev = self.tiles.get(name, 0)
        if need > prev:
            # growing: add ~6% headroom so shuffle-to-shuffle variation
            # doesn't trigger a recompile every epoch
            need = max(need + 2, int(need * 1.0625))
        t = max(prev, need)
        self.tiles[name] = t
        return t

    def build(self, name: str, ids: np.ndarray) -> GatherPlan:
        return make_gather_plan(ids, self.n_rows,
                                n_tiles=self._tiles(name, ids))

    def build_stacked(self, name: str, ids_per_batch) -> GatherPlan:
        """One plan per batch, all with a common tile count, stacked along
        a leading axis (for lax.scan)."""
        import jax.numpy as jnp
        t = max(self._tiles(name, ids) for ids in ids_per_batch)
        self.tiles[name] = t
        plans = [make_gather_plan(ids, self.n_rows, n_tiles=t)
                 for ids in ids_per_batch]
        return GatherPlan(jnp.stack([p.pos for p in plans]),
                          jnp.stack([p.local for p in plans]),
                          jnp.stack([p.block for p in plans]),
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
