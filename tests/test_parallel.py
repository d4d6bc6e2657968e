"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from subgnn_tpu.parallel.mesh import (
    make_device_mesh, batch_pspecs, anchor_pspecs, param_pspecs, shard_tree)


def test_mesh_construction():
    mesh = make_device_mesh(n_data=4, n_node=2)
    assert mesh.shape == {"data": 4, "node": 2}
    mesh1 = make_device_mesh()
    assert mesh1.shape["data"] * mesh1.shape["node"] == len(jax.devices())


def test_batch_pspecs():
    batch = {"cc_ids": np.zeros((8, 2, 3)), "NP_sim": np.zeros((8, 2, 16)),
             "I_S_sim": None, "label": np.zeros(8)}
    specs = batch_pspecs(batch)
    assert specs["NP_sim"] == P("data", None, "node")
    assert specs["cc_ids"] == P("data")
    assert specs["I_S_sim"] is None


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2_devices():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 4)
    assert bool(jnp.isfinite(out).all())


def test_sharded_forward_matches_single_device():
    """DP+node-sharded forward must be numerically identical to local."""
    import __graft_entry__ as ge
    model, hp, params, state, batch, anchors = ge._build_flagship(
        n_nodes=128, n_sub=8, C=2, L=4, n_pool=16,
        hp_overrides=dict(node_embed_size=16, n_layers=1,
                          n_anchor_patches_N_in=3, n_anchor_patches_N_out=3,
                          n_anchor_patches_pos_in=3, n_anchor_patches_pos_out=3,
                          n_anchor_patches_structure=3, n_triangular_walks=2,
                          random_walk_len=4, linear_hidden_dim_1=8,
                          linear_hidden_dim_2=8))
    local_logits, _ = model.forward(params, state, batch, anchors,
                                    train=False, rng=None)
    mesh = make_device_mesh(n_data=4, n_node=2)
    with mesh:
        sp = shard_tree(mesh, params, param_pspecs(params))
        sb = shard_tree(mesh, batch, batch_pspecs(batch))
        sa = shard_tree(mesh, anchors, anchor_pspecs(anchors))

        @jax.jit
        def fwd(p, b):
            logits, _ = model.forward(p, state, b, sa, train=False, rng=None)
            return logits

        sharded_logits = fwd(sp, sb)
    np.testing.assert_allclose(np.asarray(local_logits),
                               np.asarray(sharded_logits), atol=1e-4)


def test_sharded_trainer_fit_matches_single_device():
    """The PRODUCTION Trainer on a (data=4, node=2) mesh must reproduce the
    single-device training trajectory (fused-epoch scan + GatherPlans +
    compact sims + trainable CC tables all engaged)."""
    import __graft_entry__ as ge
    from subgnn_tpu.train.loop import Trainer

    def run(mesh_axes):
        model, hp, params, state, data, anchors, eval_cc = \
            ge._build_training_fixture(
                n_train=16, n_val=8,
                hp_overrides=dict(batch_size=8, max_epochs=3,
                                  trainable_cc=True, **mesh_axes))
        tr = Trainer(model, hp, eval_cc_tables=eval_cc)
        tr.compact_sims = True
        tr.fit(params, state, data["train"], data["val"], anchors,
               seed=0, log_fn=None)
        assert hasattr(tr, "_fused_train_epoch")
        return tr

    t_local = run({})
    t_mesh = run(dict(mesh_data_axis=4, mesh_node_axis=2))
    assert t_mesh.mesh is not None and t_local.mesh is None
    for m1, m2 in zip(t_local.metric_scores, t_mesh.metric_scores):
        np.testing.assert_allclose(m1["train_loss"], m2["train_loss"],
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(m1["val_loss"], m2["val_loss"],
                                   rtol=2e-4, atol=1e-5)
        assert m1["val_micro_f1"] == pytest.approx(m2["val_micro_f1"])


def test_sharded_trainer_streaming_matches_single_device():
    """Same trajectory check for the per-step streaming path (fused mode
    off via a short-batch train split: batch_size > n_train disables
    drop_last)."""
    import __graft_entry__ as ge
    from subgnn_tpu.train.loop import Trainer

    def run(mesh_axes):
        model, hp, params, state, data, anchors, eval_cc = \
            ge._build_training_fixture(
                n_train=12, n_val=8,
                hp_overrides=dict(batch_size=16, max_epochs=2, **mesh_axes))
        tr = Trainer(model, hp)
        tr.compact_sims = False
        tr.fit(params, state, data["train"], data["val"], anchors,
               seed=0, log_fn=None)
        assert not hasattr(tr, "_fused_train_epoch")
        return tr

    t_local = run({})
    t_mesh = run(dict(mesh_data_axis=8, mesh_node_axis=1))
    for m1, m2 in zip(t_local.metric_scores, t_mesh.metric_scores):
        np.testing.assert_allclose(m1["train_loss"], m2["train_loss"],
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(m1["val_loss"], m2["val_loss"],
                                   rtol=2e-4, atol=1e-5)


def test_dtw_shards_over_mesh():
    """Distributed precompute: the batched DTW kernel data-parallelizes over
    the mesh's pair axis (each device computes its shard; results identical
    to single-device)."""
    from jax.sharding import NamedSharding
    from subgnn_tpu.precompute.dtw import dtw_distance_batch

    rng = np.random.default_rng(0)
    N, L = 64, 12
    a = np.sort(rng.integers(0, 9, (N, L)).astype(np.float32), axis=1)
    b = np.sort(rng.integers(0, 9, (N, L)).astype(np.float32), axis=1)
    la = rng.integers(1, L + 1, N).astype(np.int32)
    lb = rng.integers(1, L + 1, N).astype(np.int32)

    local = np.asarray(dtw_distance_batch(jnp.asarray(a), jnp.asarray(la),
                                          jnp.asarray(b), jnp.asarray(lb)))
    mesh = make_device_mesh(n_data=8, n_node=1)
    sharding = NamedSharding(mesh, P("data"))
    args = [jax.device_put(jnp.asarray(x), sharding) for x in (a, la, b, lb)]
    with mesh:
        sharded = np.asarray(dtw_distance_batch(args[0], args[1],
                                                args[2], args[3]))
    np.testing.assert_allclose(local, sharded, atol=1e-5)
