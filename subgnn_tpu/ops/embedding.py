"""Embedding gather with an MXU-friendly backward (no scatter-add).

The reference's hot loop gathers anchor-node rows out of the embedding
table (reference: SubGNN/anchor_patch_samplers.py:404-411 `embed_anchor_patch`
-> nn.Embedding lookup); with a trainable table
(`freeze_node_embeds=False`, reference SubGNN.py:568) the backward of that
gather is a scatter-add of one (B*C*A)-row update per step into the
(n_nodes, D) table. XLA lowers scatter-add on TPU to a mostly serialized
update loop, which is the dominant remaining per-step cost after the MPN
einsum layouts (~0.4 ms of a ~2 ms step at B=128).

TPU-native redesign: because the anchor ids of a batch are known on the
host before dispatch (anchors are pre-sampled per (split, layer) and the
epoch's batch schedule is host-generated), we precompute a **gather plan**:

  * sort the flat ids once on the host (numpy argsort),
  * bucket the sorted ids by table-row block (block = TABLE_BLOCK rows),
  * pad each bucket to a common static width.

The backward then becomes, per table block t:

    dtable[t*BT:(t+1)*BT] = onehot(local_ids_t)^T @ g_sorted_t

a dense (BT x W) x (W x D) matmul on the MXU with the one-hot built on the
fly in VMEM (never materialized in HBM) — a Pallas kernel over a
(n_blocks,) grid. The only data-dependent work left is one XLA row gather
(g_flat -> padded buckets), which TPUs do at full HBM bandwidth.

Accumulation is fp32 regardless of the activation dtype.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

TABLE_BLOCK = 128  # table rows per backward matmul block (MXU-sized)


class GatherPlan(NamedTuple):
    """Static routing for the backward of `table[ids]`.

    pos:       (n_blocks, width) int32 — index into the FLAT gradient rows
               (i.e. into ids.reshape(-1)); padding slots point at n_ids
               (a zero row appended to the gradient).
    local_row: (n_blocks, width) int32 — id - block*TABLE_BLOCK for real
               slots; TABLE_BLOCK (out of range -> all-zero one-hot row)
               for padding slots.
    n_rows:    static int, number of table rows (padded table height).

    Registered as a pytree with n_rows as static aux data, so plans pass
    through jit / lax.scan (stacked per batch) without tracing n_rows.
    """

    pos: jnp.ndarray
    local_row: jnp.ndarray
    n_rows: int


jax.tree_util.register_pytree_node(
    GatherPlan,
    lambda p: ((p.pos, p.local_row), p.n_rows),
    lambda n_rows, ch: GatherPlan(ch[0], ch[1], n_rows))


def make_gather_plan(ids: np.ndarray, n_rows: int,
                     width: int | None = None) -> GatherPlan:
    """Build the backward routing for a static id array (host-side, numpy).

    ids may have any shape; values in [0, n_rows). `width` fixes the padded
    bucket width (rounded up to a multiple of 8) so plans for same-shaped
    batches share one compiled kernel; defaults to the max bucket size.
    """
    flat = np.asarray(ids, np.int64).reshape(-1)
    if flat.size and (flat.min() < 0 or flat.max() >= n_rows):
        raise ValueError("ids out of range for table")
    n_blocks = -(-n_rows // TABLE_BLOCK)
    order = np.argsort(flat, kind="stable").astype(np.int64)
    sorted_ids = flat[order]
    block_of = sorted_ids // TABLE_BLOCK
    counts = np.bincount(block_of, minlength=n_blocks)
    max_count = int(counts.max()) if flat.size else 0
    if width is None:
        width = max_count
    width = max(128, -(-width // 128) * 128)  # lane-aligned bucket width
    if max_count > width:
        raise ValueError(f"plan width {width} < max bucket size {max_count}")

    pos = np.full((n_blocks, width), flat.size, np.int64)
    local = np.full((n_blocks, width), TABLE_BLOCK, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for b in range(n_blocks):
        c = counts[b]
        if c:
            seg = slice(starts[b], starts[b] + c)
            pos[b, :c] = order[seg]
            local[b, :c] = sorted_ids[seg] - b * TABLE_BLOCK
    return GatherPlan(jnp.asarray(pos, jnp.int32),
                      jnp.asarray(local, jnp.int32), int(n_rows))


def plan_width_for(n_ids: int, n_rows: int, slack: float = 1.35) -> int:
    """A shared static width for batches of ~uniformly spread ids: expected
    bucket size times `slack`, floored at 64. Lets every batch of an epoch
    reuse one compiled kernel; make_gather_plan raises if a batch exceeds
    it (caller falls back to an exact-width plan)."""
    n_blocks = max(1, -(-n_rows // TABLE_BLOCK))
    expect = -(-n_ids // n_blocks)
    return max(128, int(expect * slack))


# ---------------------------------------------------------------- backward


def _segment_matmul_xla(g_pad, plan: GatherPlan, out_dtype):
    """Reference/fallback backward: padded-bucket one-hot einsum in XLA.
    Used on CPU and in tests; materializes the one-hot, so the Pallas path
    is preferred on TPU."""
    gb = g_pad[plan.pos]                                   # (n_blocks, W, D)
    onehot = (plan.local_row[:, :, None]
              == jnp.arange(TABLE_BLOCK)[None, None, :])   # (n_blocks, W, BT)
    out = jnp.einsum("nwb,nwd->nbd", onehot.astype(jnp.float32),
                     gb.astype(jnp.float32))
    return out.reshape(-1, g_pad.shape[-1])[: plan.n_rows].astype(out_dtype)


def _segment_matmul_pallas(g_pad, plan: GatherPlan, out_dtype):
    """dtable = blocked onehot^T @ g via a Pallas kernel, one grid step per
    TABLE_BLOCK rows of the table; the one-hot lives only in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = g_pad.shape[-1]
    n_blocks, W = plan.pos.shape
    gb = g_pad[plan.pos.reshape(-1)].reshape(n_blocks, W, D)

    def kernel(local_ref, g_ref, out_ref):
        local = local_ref[:]                               # (1, W)
        onehot = (local[0, :, None]
                  == jax.lax.broadcasted_iota(
                      jnp.int32, (W, TABLE_BLOCK), 1)).astype(g_ref.dtype)
        out_ref[:] = jax.lax.dot_general(
            onehot, g_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TABLE_BLOCK, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * TABLE_BLOCK, D),
                                       jnp.float32),
    )(plan.local_row, gb)
    return out[: plan.n_rows].astype(out_dtype)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------- the op


@jax.custom_vjp
def embedding_gather(table, ids, plan: GatherPlan):
    """table[ids] whose backward routes gradients through `plan` instead of
    a scatter-add. `plan` must have been built from exactly `ids`
    (make_gather_plan); padding/extra table rows receive zero grad."""
    return table[ids]


def _fwd(table, ids, plan):
    # carry table height + dtype as a zero-byte array (residuals must be
    # JAX types); D comes off the cotangent
    return table[ids], (plan, jnp.zeros((table.shape[0], 0), table.dtype))


def _bwd(res, g):
    plan, tproto = res
    tshape, tdtype = tproto.shape, tproto.dtype
    D = g.shape[-1]
    g_flat = g.reshape(-1, D)
    g_pad = jnp.concatenate(
        [g_flat, jnp.zeros((1, D), g_flat.dtype)], axis=0)
    fn = _segment_matmul_pallas if _on_tpu() else _segment_matmul_xla
    dtable = fn(g_pad, plan, tdtype)
    if dtable.shape[0] != tshape[0]:
        dtable = jnp.concatenate(
            [dtable, jnp.zeros((tshape[0] - dtable.shape[0], D), tdtype)],
            axis=0)
    return dtable, None, None


embedding_gather.defvjp(_fwd, _bwd)
