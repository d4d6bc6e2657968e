"""embedding_gather: plan-routed backward == autodiff of a plain gather.

The op replaces the scatter-add backward of the reference's trainable
nn.Embedding lookups (reference: SubGNN/SubGNN.py:568,
anchor_patch_samplers.py:404-411) with a blocked one-hot matmul routed by
a host-built plan; these tests pin exact gradient equivalence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from subgnn_tpu.ops.embedding import (
    GatherPlan, TABLE_BLOCK, TILE_WIDTH, embedding_gather, make_gather_plan,
    tiles_needed, _segment_matmul_xla)


def _grad_pair(table, ids, plan, g_seed=1):
    """(d_table via op, d_table via plain autodiff) for a random cotangent."""
    def via_op(t):
        return embedding_gather(t, ids, plan)

    def plain(t):
        return t[ids]

    out, vjp_op = jax.vjp(via_op, table)
    _, vjp_plain = jax.vjp(plain, table)
    g = jax.random.normal(jax.random.PRNGKey(g_seed), out.shape, out.dtype)
    return vjp_op(g)[0], vjp_plain(g)[0]


@pytest.mark.parametrize("shape", [(7,), (4, 5), (2, 3, 4, 6)])
def test_grad_matches_autodiff(shape):
    rng = np.random.default_rng(0)
    n_rows, D = 300, 16
    table = jnp.asarray(rng.normal(size=(n_rows, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_rows, shape).astype(np.int32))
    plan = make_gather_plan(np.asarray(ids), n_rows)
    d_op, d_plain = _grad_pair(table, ids, plan)
    np.testing.assert_allclose(np.asarray(d_op), np.asarray(d_plain),
                               rtol=1e-5, atol=1e-5)


def test_forward_is_plain_gather():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, (3, 5)).astype(np.int32))
    plan = make_gather_plan(np.asarray(ids), 64)
    np.testing.assert_array_equal(
        np.asarray(embedding_gather(table, ids, plan)),
        np.asarray(table[ids]))


def test_repeated_ids_accumulate():
    # every slot hits row 3 -> grad row 3 is the sum of all cotangent rows
    table = jnp.zeros((10, 4))
    ids = jnp.full((6,), 3, jnp.int32)
    plan = make_gather_plan(np.asarray(ids), 10)
    d_op, d_plain = _grad_pair(table, ids, plan)
    np.testing.assert_allclose(np.asarray(d_op), np.asarray(d_plain),
                               rtol=1e-6, atol=1e-6)
    assert np.abs(np.asarray(d_op)[3]).sum() > 0


def test_shared_tile_plans_have_same_shape():
    rng = np.random.default_rng(2)
    n_rows, n_ids = 1000, 5000
    batches = [rng.integers(0, n_rows, n_ids) for _ in range(3)]
    t = max(tiles_needed(b, n_rows) for b in batches)
    plans = [make_gather_plan(b, n_rows, n_tiles=t) for b in batches]
    assert len({p.pos.shape for p in plans}) == 1


def test_tile_overflow_raises():
    ids = np.zeros(2 * TILE_WIDTH, np.int64)  # one hot block, needs 2 tiles
    with pytest.raises(ValueError):
        make_gather_plan(ids, 1000, n_tiles=tiles_needed(ids, 1000) - 1)


def test_skewed_ids_grow_tiles_not_width():
    """Hub-concentrated ids (the component250 regression): all ids in one
    TABLE_BLOCK must produce ~n_ids/TILE_WIDTH tiles of fixed width, and
    gradients must still be exact."""
    rng = np.random.default_rng(5)
    n_rows, D = 10 * TABLE_BLOCK, 16
    ids = jnp.asarray(rng.integers(0, TABLE_BLOCK, 3000).astype(np.int32))
    plan = make_gather_plan(np.asarray(ids), n_rows)
    assert plan.pos.shape[1] == TILE_WIDTH
    # 6 tiles for the hot block + 1 coverage tile per empty block
    assert plan.pos.shape[0] == 6 + 9
    table = jnp.asarray(rng.normal(size=(n_rows, D)).astype(np.float32))
    d_op, d_plain = _grad_pair(table, ids, plan)
    np.testing.assert_allclose(np.asarray(d_op), np.asarray(d_plain),
                               rtol=1e-4, atol=1e-4)


def test_pallas_matches_xla_backend(monkeypatch):
    """The Pallas kernel (interpret mode off-TPU) == the XLA fallback."""
    from subgnn_tpu.ops import embedding as E
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(3)
    n_rows, D, n_ids = 4 * TABLE_BLOCK, 32, 2000
    # mix uniform + hub-skewed ids so tiles revisit blocks
    ids = np.concatenate([rng.integers(0, n_rows, n_ids),
                          np.full(3 * TILE_WIDTH, 7)])
    n_ids = ids.size
    plan = make_gather_plan(ids, n_rows)
    g_pad = jnp.asarray(
        rng.normal(size=(n_ids + 1, D)).astype(np.float32)).at[-1].set(0.0)

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)
    out_pallas = E._segment_matmul_pallas(g_pad, plan, jnp.float32)
    out_xla = _segment_matmul_xla(g_pad, plan, jnp.float32)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)


def test_grad_under_jit_and_table_padding():
    """Aligned (padded) table rows get zero grad; works inside jit."""
    rng = np.random.default_rng(4)
    n_rows, D = 130, 8          # plan covers 130 rows, table padded to 136
    table = jnp.asarray(rng.normal(size=(136, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_rows, (40,)).astype(np.int32))
    plan = make_gather_plan(np.asarray(ids), n_rows)

    @jax.jit
    def loss(t):
        return embedding_gather(t, ids, plan).sum()

    d = jax.grad(loss)(table)
    assert d.shape == table.shape
    np.testing.assert_allclose(np.asarray(d[n_rows:]), 0.0)
    d_plain = jax.grad(lambda t: t[ids].sum())(table)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_plain),
                               rtol=1e-6, atol=1e-6)


def test_model_grads_with_plans_match_no_plans():
    """Full SubGNN training-step gradients are identical whether the
    embedding-table backward goes through gather plans or the plain
    scatter-add (the integration contract of train/plans.py)."""
    import __graft_entry__ as ge
    from subgnn_tpu.train.plans import PlanBuilder, neigh_ids_for_batch

    model, hp, params, state, batch, anchors = ge._build_flagship(
        n_nodes=100, n_sub=8, C=2, L=4, n_pool=10,
        hp_overrides=dict(node_embed_size=16, n_layers=2,
                          n_anchor_patches_N_in=3, n_anchor_patches_N_out=4,
                          n_anchor_patches_pos_in=3, n_anchor_patches_pos_out=5,
                          n_anchor_patches_structure=3, n_triangular_walks=2,
                          random_walk_len=4, linear_hidden_dim_1=8,
                          linear_hidden_dim_2=8))

    def grads(with_plans):
        b = dict(batch)
        if with_plans:
            builder = PlanBuilder(params["node_embed"].shape[0])
            b["cc_plan"] = builder.build("cc", np.asarray(b["cc_ids"]))
            b["neigh_plan"] = builder.build(
                "neigh", neigh_ids_for_batch(anchors, np.arange(8)))

        def loss(p):
            logits, _ = model.forward(p, state, b, anchors, train=True,
                                      rng=jax.random.PRNGKey(0))
            return model.loss_fn(logits, b["label"], b["valid"])

        return jax.grad(loss)(params)

    g_plain, g_plan = grads(False), grads(True)
    flat_a, _ = jax.tree_util.tree_flatten(g_plain)
    flat_b, _ = jax.tree_util.tree_flatten(g_plan)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
