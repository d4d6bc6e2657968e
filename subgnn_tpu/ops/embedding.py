"""Embedding gather with an MXU-friendly backward (no scatter-add).

The reference's hot loop gathers anchor-node rows out of the embedding
table (reference: SubGNN/anchor_patch_samplers.py:404-411 `embed_anchor_patch`
-> nn.Embedding lookup); with a trainable table
(`freeze_node_embeds=False`, reference SubGNN.py:568) the backward of that
gather is a scatter-add of one (B*C*A)-row update per step into the
(n_nodes, D) table. XLA lowers scatter-add on TPU to a mostly serialized
update loop, which is the dominant remaining per-step cost after the MPN
einsum layouts.

TPU-native redesign: because the anchor ids of a batch are known on the
host before dispatch (anchors are pre-sampled per (split, layer) and the
epoch's batch schedule is host-generated), we precompute a **gather plan**
— a row-split tiled CSR of the transposed gather:

  * sort the flat ids once on the host (numpy argsort),
  * bucket the sorted ids by table-row block (TABLE_BLOCK rows),
  * split each bucket into fixed-width tiles (TILE_WIDTH ids); hot blocks
    (graph hubs, the PAD row) simply get many tiles, so skewed id
    distributions cost no padding blow-up,
  * every table block gets at least one (possibly empty) tile so the
    output is fully defined.

The backward then becomes, per tile t with table block b = block[t]:

    dtable[b*BT:(b+1)*BT] (+)= onehot(local_t)^T @ g_sorted_t

a dense (BT x W) x (W x D) matmul on the MXU with the one-hot built on the
fly in VMEM (never materialized in HBM) — a Pallas kernel over a
(n_tiles,) grid whose output block index comes from scalar-prefetched
`block`; tiles of the same block are consecutive, so the accumulator
stays resident in VMEM between revisits. The only data-dependent work
left is one XLA row gather (g_flat -> tiles), which TPUs do at full HBM
bandwidth. Accumulation is fp32 regardless of the activation dtype.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

TABLE_BLOCK = 128   # table rows per output tile (MXU-sized)
TILE_WIDTH = 512    # ids per plan tile


class GatherPlan(NamedTuple):
    """Static routing for the backward of `table[ids]`.

    pos:   (n_tiles, W) int32 — index into the FLAT gradient rows (i.e.
           into ids.reshape(-1)); padding slots point at n_ids (a zero row
           appended to the gradient).
    local: (n_tiles, W) int32 — id - block*TABLE_BLOCK for real slots;
           TABLE_BLOCK (out of range -> all-zero one-hot row) for padding.
    block: (n_tiles,) int32 — table block each tile accumulates into;
           non-decreasing, covers every block at least once.
    n_rows: static int, number of table rows the plan covers.

    Registered as a pytree with n_rows as static aux data, so plans pass
    through jit / lax.scan (stacked per batch) without tracing n_rows.
    """

    pos: jnp.ndarray
    local: jnp.ndarray
    block: jnp.ndarray
    n_rows: int


jax.tree_util.register_pytree_node(
    GatherPlan,
    lambda p: ((p.pos, p.local, p.block), p.n_rows),
    lambda n_rows, ch: GatherPlan(ch[0], ch[1], ch[2], n_rows))


def tiles_needed(ids: np.ndarray, n_rows: int) -> int:
    """Tile count make_gather_plan would use for this id multiset."""
    flat = np.asarray(ids, np.int64).reshape(-1)
    n_blocks = -(-n_rows // TABLE_BLOCK)
    counts = np.bincount(flat // TABLE_BLOCK, minlength=n_blocks)
    return int(np.maximum(-(-counts // TILE_WIDTH), 1).sum())


def make_gather_plan(ids: np.ndarray, n_rows: int,
                     n_tiles: int | None = None) -> GatherPlan:
    """Build the backward routing for a static id array (host-side, numpy).

    ids may have any shape; values in [0, n_rows). `n_tiles` fixes the
    tile count (>= tiles_needed) so plans for same-shaped batches share
    one compiled kernel; defaults to exactly tiles_needed. Padding tiles
    are appended mapped to the last block (pure zero-adds).
    """
    flat = np.asarray(ids, np.int64).reshape(-1)
    if flat.size and (flat.min() < 0 or flat.max() >= n_rows):
        raise ValueError("ids out of range for table")
    n_blocks = -(-n_rows // TABLE_BLOCK)
    order = np.argsort(flat, kind="stable").astype(np.int64)
    sorted_ids = flat[order]
    counts = np.bincount(sorted_ids // TABLE_BLOCK, minlength=n_blocks)
    tiles_per_block = np.maximum(-(-counts // TILE_WIDTH), 1)
    need = int(tiles_per_block.sum())
    if n_tiles is None:
        n_tiles = need
    if need > n_tiles:
        raise ValueError(f"plan needs {need} tiles > requested {n_tiles}")

    W = TILE_WIDTH
    pos = np.full((n_tiles, W), flat.size, np.int64)
    local = np.full((n_tiles, W), TABLE_BLOCK, np.int64)
    block = np.full(n_tiles, n_blocks - 1, np.int64)
    t = 0
    start = 0
    for b in range(n_blocks):
        c = int(counts[b])
        for k in range(int(tiles_per_block[b])):
            lo = start + k * W
            hi = min(start + c, lo + W)
            m = max(hi - lo, 0)
            if m:
                pos[t, :m] = order[lo:hi]
                local[t, :m] = sorted_ids[lo:hi] - b * TABLE_BLOCK
            block[t] = b
            t += 1
        start += c
    return GatherPlan(jnp.asarray(pos, jnp.int32),
                      jnp.asarray(local, jnp.int32),
                      jnp.asarray(block, jnp.int32), int(n_rows))


# ---------------------------------------------------------------- backward


def _segment_matmul_xla(g_pad, plan: GatherPlan, out_dtype):
    """Reference/fallback backward: per-tile one-hot einsum + a small
    block-level scatter-add. Used on CPU and in tests; the Pallas path is
    preferred on TPU (no materialized one-hot, no scatter)."""
    D = g_pad.shape[-1]
    n_blocks = -(-plan.n_rows // TABLE_BLOCK)
    gb = g_pad[plan.pos]                                    # (T, W, D)
    onehot = (plan.local[:, :, None]
              == jnp.arange(TABLE_BLOCK)[None, None, :])    # (T, W, BT)
    contrib = jnp.einsum("twb,twd->tbd", onehot.astype(jnp.float32),
                         gb.astype(jnp.float32))            # (T, BT, D)
    out = jnp.zeros((n_blocks, TABLE_BLOCK, D), jnp.float32
                    ).at[plan.block].add(contrib)
    return out.reshape(-1, D)[: plan.n_rows].astype(out_dtype)


def _segment_matmul_pallas(g_pad, plan: GatherPlan, out_dtype):
    """dtable = tiled onehot^T @ g via a Pallas kernel over (n_tiles,);
    the output block index is scalar-prefetched and consecutive same-block
    tiles accumulate in VMEM (revisiting)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = g_pad.shape[-1]
    n_tiles, W = plan.pos.shape
    n_blocks = -(-plan.n_rows // TABLE_BLOCK)
    gb = g_pad[plan.pos.reshape(-1)].reshape(n_tiles, W, D)

    def kernel(block_ref, local_ref, g_ref, out_ref):
        t = pl.program_id(0)
        # local stays VMEM-resident in full (constant index_map); a (1, W)
        # tile block would violate the (8, 128)-divisible sublane rule
        local = local_ref[t, :]                             # (W,)
        onehot = (local[:, None]
                  == jax.lax.broadcasted_iota(
                      jnp.int32, (W, TABLE_BLOCK), 1)).astype(g_ref.dtype)
        contrib = jax.lax.dot_general(
            onehot, g_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        prev = block_ref[jnp.maximum(t - 1, 0)]
        first = jnp.logical_or(t == 0, block_ref[t] != prev)

        @pl.when(first)
        def _():
            out_ref[:] = contrib.astype(out_ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:] = out_ref[:] + contrib.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_tiles, W), lambda t, blk: (0, 0)),
            pl.BlockSpec((1, W, D), lambda t, blk: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TABLE_BLOCK, D),
                               lambda t, blk: (blk[t], 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * TABLE_BLOCK, D),
                                       jnp.float32),
    )(plan.block, plan.local, gb)
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
