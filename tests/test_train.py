import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subgnn_tpu.config import HParams
from subgnn_tpu.train import metrics as M
from subgnn_tpu.train.loop import Trainer
from subgnn_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, load_params_filtered, TopKCheckpoints)
from subgnn_tpu.models.subgnn import SubGNNModel


# ----------------------------------------------------------------- metrics

def test_f1_accuracy_vs_sklearn(rng):
    sk = pytest.importorskip("sklearn.metrics")
    logits = rng.normal(size=(50, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 50)
    pred = logits.argmax(-1)
    for avg in ("micro", "macro"):
        got = M.calc_f1(logits, labels, avg)
        expect = sk.f1_score(labels, pred, average=avg)
        assert abs(got - expect) < 1e-9
    assert abs(M.calc_accuracy(logits, labels) -
               sk.accuracy_score(labels, pred)) < 1e-9


def test_multilabel_f1_vs_sklearn(rng):
    sk = pytest.importorskip("sklearn.metrics")
    logits = rng.normal(size=(40, 5)).astype(np.float32)
    labels = (rng.random((40, 5)) > 0.5).astype(np.int64)
    pred = (1 / (1 + np.exp(-logits))) > 0.5
    for avg in ("micro", "macro"):
        got = M.calc_f1(logits, labels, avg, multilabel=True)
        expect = sk.f1_score(labels, pred, average=avg)
        assert abs(got - expect) < 1e-9
    assert abs(M.calc_accuracy(logits, labels, multilabel=True) -
               sk.accuracy_score(labels, pred)) < 1e-9


def test_auc_vs_sklearn(rng):
    sk = pytest.importorskip("sklearn.metrics")
    # binary with ties
    y = rng.integers(0, 2, 100)
    s = np.round(rng.random(100), 1)
    assert abs(M.binary_auc(y, s) - sk.roc_auc_score(y, s)) < 1e-9
    # multiclass ovr
    logits = rng.normal(size=(100, 3)).astype(np.float64)
    labels = rng.integers(0, 3, 100)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    got, per_class = M.roc_auc_ovr(logits, labels)
    expect = sk.roc_auc_score(labels, probs, multi_class="ovr")
    assert abs(got - expect) < 1e-9
    # multilabel
    ml = (rng.random((100, 3)) > 0.5).astype(np.int64)
    got_ml, _ = M.roc_auc_ovr(logits, ml, multilabel=True)
    expect_ml = sk.roc_auc_score(ml, 1 / (1 + np.exp(-logits)))
    assert abs(got_ml - expect_ml) < 1e-9


# -------------------------------------------------------------- checkpoint

def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.ones((3, 2)), "nested": {"b": jnp.zeros(4)}}
    p = tmp_path / "x.ckpt"
    save_checkpoint(p, params, meta={"epoch": 3})
    back = load_checkpoint(p)
    np.testing.assert_array_equal(back["params"]["a"], np.ones((3, 2)))
    assert back["meta"]["epoch"] == 3
    # filtered load with an extra/missing key
    current = {"a": jnp.full((3, 2), 7.0), "nested": {"b": jnp.ones(4)},
               "new": jnp.ones(1)}
    merged = load_params_filtered(p, current)
    np.testing.assert_array_equal(merged["a"], np.ones((3, 2)))
    np.testing.assert_array_equal(merged["new"], np.ones(1))


def test_topk_checkpoints(tmp_path):
    topk = TopKCheckpoints(tmp_path, k=2, monitor="val_micro_f1")
    for epoch, f1 in enumerate([0.1, 0.5, 0.3, 0.7]):
        topk.maybe_save(epoch, {"val_micro_f1": f1, "val_acc": f1,
                                "val_auroc": f1}, {"w": jnp.zeros(1)})
    assert len(list(tmp_path.glob("*.ckpt"))) == 2
    assert "0.70" in topk.best_path.name


# ----------------------------------------------------------- training loop

def test_trainer_overfits_toy_task(rng):
    from tests.test_models import build_toy, HP
    hp = HP.replace(max_epochs=30, batch_size=6, learning_rate=5e-3,
                    grad_clip=0.5)
    model, params, state, batch, anchors, cc_ids = build_toy(hp, rng)
    # build a SubgraphData-like wrapper over the toy arrays
    import dataclasses
    from subgnn_tpu.data.dataset import SubgraphData
    labels = np.array([0, 1, 2, 0, 1, 2])
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=labels,
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    trainer = Trainer(model, hp)
    anchors_by_split = {"train": anchors, "val": anchors}
    final = trainer.fit(params, state, data, data, anchors_by_split, seed=0,
                        log_fn=None)
    losses = [m["train_loss"] for m in trainer.metric_scores]
    assert losses[-1] < losses[0] * 0.8, losses
    assert final["val_acc"] > 0.5
    assert trainer.best_monitor_value() >= final["val_micro_f1"] - 1e-9
    # metric keys match the reference contract
    for key in ("val_loss", "val_micro_f1", "val_macro_f1", "val_acc",
                "avg_val_acc", "avg_macro_f1", "val_auroc",
                "val_auroc_class_0"):
        assert key in final, key


def test_freeze_node_embeds(rng):
    from tests.test_models import build_toy, HP
    hp = HP.replace(max_epochs=2, batch_size=6, freeze_node_embeds=True)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    from subgnn_tpu.data.dataset import SubgraphData
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    before = np.asarray(params["node_embed"]).copy()
    trainer = Trainer(model, hp)
    trainer.fit(params, state, data, data, {"train": anchors, "val": anchors},
                seed=0, log_fn=None)
    np.testing.assert_array_equal(np.asarray(trainer.params["node_embed"]),
                                  before)


def test_trainer_resume(rng, tmp_path):
    from tests.test_models import build_toy, HP
    from subgnn_tpu.data.dataset import SubgraphData
    hp = HP.replace(max_epochs=3, batch_size=6)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    t1 = Trainer(model, hp, ckpt_dir=tmp_path)
    t1.fit(params, state, data, data, {"train": anchors, "val": anchors},
           seed=0, log_fn=None)
    ckpt = t1.ckpt.best_path
    assert ckpt is not None

    t2 = Trainer(model, hp.replace(max_epochs=1))
    start = t2.resume_from(ckpt)
    assert start >= 1
    t2.fit(params, state, data, data, {"train": anchors, "val": anchors},
           seed=0, log_fn=None)
    # resumed params differ from the fresh init (they continued training)
    diff = float(jnp.abs(t2.params["head"]["lin1"]["w"]
                         - params["head"]["lin1"]["w"]).max())
    assert diff > 0


def test_lr_find(rng):
    from tests.test_models import build_toy, HP
    from subgnn_tpu.data.dataset import SubgraphData
    hp = HP.replace(batch_size=6)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    t = Trainer(model, hp)
    lr = t.lr_find(params, state, data, {"train": anchors}, num_steps=25)
    assert 1e-7 < lr < 1.0


def test_fused_matches_streaming(rng, monkeypatch):
    """Fused-epoch and per-step streaming modes draw identical batch orders
    and rng streams, so they must produce the same trained parameters."""
    from tests.test_models import build_toy, HP
    from subgnn_tpu.data.dataset import SubgraphData
    hp = HP.replace(max_epochs=3, batch_size=3)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    t_fused = Trainer(model, hp)
    t_fused.fit(params, state, data, data, {"train": anchors, "val": anchors},
                seed=0, log_fn=None)

    t_stream = Trainer(model, hp)
    monkeypatch.setattr(Trainer, "_split_bytes", staticmethod(lambda d: 1 << 40))
    t_stream.fit(params, state, data, data,
                 {"train": anchors, "val": anchors}, seed=0, log_fn=None)

    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(t_fused.params),
            jax.tree_util.tree_leaves_with_path(t_stream.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5,
                                   err_msg=jax.tree_util.keystr(p1))
    f1 = [m["train_loss"] for m in t_fused.metric_scores]
    f2 = [m["train_loss"] for m in t_stream.metric_scores]
    np.testing.assert_allclose(f1, f2, atol=1e-5)


def test_resample_anchor_patches_stays_fused(rng, monkeypatch):
    """Per-epoch anchor resampling (reference SubGNN.py:448-460) keeps the
    one-dispatch-per-epoch fused mode (anchors are jit args, same shapes
    across epochs) and produces the same trajectory as the streaming path
    under the same resample schedule."""
    from tests.test_models import build_toy, HP
    from subgnn_tpu.data.dataset import SubgraphData
    hp = HP.replace(max_epochs=3, batch_size=3, resample_anchor_patches=True)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )

    def resampled(epoch):
        r = np.random.default_rng(100 + epoch)
        new = {k: jnp.asarray(r.integers(0, np.asarray(v).max() + 1,
                                         v.shape).astype(np.int32))
               for k, v in anchors.items()}
        return {"train": new, "val": new}

    t_fused = Trainer(model, hp)
    t_fused.fit(params, state, data, data, {"train": anchors, "val": anchors},
                seed=0, on_epoch_end=resampled, log_fn=None)
    assert hasattr(t_fused, "_fused_train_epoch")  # stayed on the fast path

    t_stream = Trainer(model, hp)
    monkeypatch.setattr(Trainer, "_split_bytes",
                        staticmethod(lambda d: 1 << 40))
    t_stream.fit(params, state, data, data,
                 {"train": anchors, "val": anchors}, seed=0,
                 on_epoch_end=resampled, log_fn=None)
    assert not hasattr(t_stream, "_fused_train_epoch")

    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(t_fused.params),
            jax.tree_util.tree_leaves_with_path(t_stream.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5,
                                   err_msg=jax.tree_util.keystr(p1))
    np.testing.assert_allclose(
        [m["train_loss"] for m in t_fused.metric_scores],
        [m["train_loss"] for m in t_stream.metric_scores], atol=1e-5)
    np.testing.assert_allclose(
        [m["val_loss"] for m in t_fused.metric_scores],
        [m["val_loss"] for m in t_stream.metric_scores], atol=1e-5)


def test_debug_mode_grad_norms(rng):
    from tests.test_models import build_toy, HP
    from subgnn_tpu.data.dataset import SubgraphData
    import jax
    hp = HP.replace(max_epochs=2, batch_size=6, debug_mode=True)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    t = Trainer(model, hp)
    try:
        t.fit(params, state, data, data, {"train": anchors, "val": anchors},
              seed=0, log_fn=None)
        assert "grad_norm" in t.metric_scores[-1]
        assert t.metric_scores[-1]["grad_norm"] > 0
    finally:
        jax.config.update("jax_debug_nans", False)


def test_compact_sims_match_resident(rng):
    """compact_sims mode (host-gathered anchor-column similarities,
    train/sims.py) reproduces the resident-NP_sim trainer exactly, in both
    fused and streaming modes, including the evaluate() path."""
    from tests.test_models import build_toy, HP
    from subgnn_tpu.data.dataset import SubgraphData
    hp = HP.replace(max_epochs=3, batch_size=3)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    results = {}
    for mode in (False, True):
        t = Trainer(model, hp)
        t.compact_sims = mode
        t.fit(params, state, data, data,
              {"train": anchors, "val": anchors}, seed=0, log_fn=None)
        test_m = t.evaluate(data, anchors, "test")
        results[mode] = (t.params, t.metric_scores, test_m)

    p_res, m_res, e_res = results[False]
    p_cmp, m_cmp, e_cmp = results[True]
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_res),
            jax.tree_util.tree_leaves_with_path(p_cmp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))
    np.testing.assert_allclose([m["train_loss"] for m in m_res],
                               [m["train_loss"] for m in m_cmp], atol=1e-6)
    np.testing.assert_allclose([m["val_micro_f1"] for m in m_res],
                               [m["val_micro_f1"] for m in m_cmp])
    assert e_res["test_micro_f1"] == e_cmp["test_micro_f1"]
    np.testing.assert_allclose(e_res["test_loss"], e_cmp["test_loss"],
                               atol=1e-6)


def test_compact_default_on_in_fused_mode(rng):
    """Round-2 default: fused-mode training uses compact sims at EVERY
    NP-sim size (2.15x measured, PERF.md); streaming stays size-gated."""
    from tests.test_models import build_toy, HP
    from subgnn_tpu.data.dataset import SubgraphData
    hp = HP.replace(max_epochs=1, batch_size=3)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    t = Trainer(model, hp)
    t.fit(params, state, data, data, {"train": anchors, "val": anchors},
          seed=0, log_fn=None)
    assert t.compact_sims is True  # tiny NP_sim, but fused -> compact

    # streaming (batch_size > split disables drop_last/fused): size-gated
    t2 = Trainer(model, hp.replace(batch_size=64))
    t2.fit(params, state, data, data, {"train": anchors, "val": anchors},
           seed=0, log_fn=None)
    assert t2.compact_sims is False  # tiny NP_sim, streaming -> resident


def test_fit_owns_the_anchors_dict(rng):
    """Per-epoch anchor resampling must not leak into the caller's dict —
    the reference samples test anchors independently at test time
    (SubGNN.py prepare_test_data), so run()'s final test eval has to see
    the ORIGINAL anchors regardless of mesh shape (review round-2 fix)."""
    from tests.test_models import build_toy, HP
    hp = HP.replace(max_epochs=3, batch_size=6,
                    resample_anchor_patches=True)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    from subgnn_tpu.data.dataset import SubgraphData
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    caller = {"train": anchors, "val": anchors}
    resampled = []

    def on_epoch_end(epoch):
        # hand back DISTINCT anchor objects (same arrays, new containers)
        new = {"train": dict(anchors), "val": dict(anchors)}
        resampled.append(new)
        return new

    trainer = Trainer(model, hp)
    trainer.fit(params, state, data, data, caller, seed=0,
                on_epoch_end=on_epoch_end, log_fn=None)
    assert resampled, "on_epoch_end never ran"
    # the caller's dict still maps to the ORIGINAL anchors objects —
    # fit() must update its own copy, not the caller's
    assert caller["train"] is anchors and caller["val"] is anchors


def test_fused_val_metrics_match_streaming_ragged(rng, monkeypatch):
    """Fused eval aggregates per-BATCH acc/macro-F1 means exactly like the
    streaming evaluate() loop, including a ragged final val batch (review
    round-2 fix: the whole-split macro-F1 differed from the per-batch
    mean, so mode selection could change 'avg_macro_f1')."""
    from tests.test_models import build_toy, HP
    from subgnn_tpu.data.dataset import SubgraphData
    hp = HP.replace(max_epochs=2, batch_size=4)  # 6 subgraphs -> 4 + 2
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    t_fused = Trainer(model, hp)
    t_fused.fit(params, state, data, data, {"train": anchors, "val": anchors},
                seed=0, log_fn=None)
    assert hasattr(t_fused, "_fused_train_epoch")

    t_stream = Trainer(model, hp)
    monkeypatch.setattr(Trainer, "_split_bytes",
                        staticmethod(lambda d: 1 << 40))
    t_stream.fit(params, state, data, data,
                 {"train": anchors, "val": anchors}, seed=0, log_fn=None)
    assert not hasattr(t_stream, "_fused_train_epoch")

    for mf, ms in zip(t_fused.metric_scores, t_stream.metric_scores):
        for k in ("val_loss", "val_micro_f1", "val_acc", "avg_val_acc",
                  "avg_macro_f1", "val_auroc"):
            np.testing.assert_allclose(mf[k], ms[k], atol=1e-5, err_msg=k)


def test_resume_reproduces_uninterrupted_run(rng, tmp_path):
    """Elastic recovery invariance: train 2 epochs, checkpoint, resume for
    epochs 2-3 — the final params match an uninterrupted 4-epoch run
    exactly (same shuffle draws via the start_epoch fast-forward, same RNG
    stream via the restored global_step)."""
    from tests.test_models import build_toy, HP
    from subgnn_tpu.data.dataset import SubgraphData
    hp4 = HP.replace(max_epochs=4, batch_size=3)
    model, params, state, batch, anchors, _ = build_toy(hp4, rng)
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    by_split = {"train": anchors, "val": anchors}

    # uninterrupted 4-epoch run
    t_full = Trainer(model, hp4)
    t_full.fit(params, state, data, data, by_split, seed=0, log_fn=None)

    # 2 epochs, manual checkpoint, then resume epochs 2-3
    t_a = Trainer(model, hp4.replace(max_epochs=2))
    t_a.fit(params, state, data, data, by_split, seed=0, log_fn=None)
    ckpt = tmp_path / "mid.ckpt"
    save_checkpoint(ckpt, t_a.params, t_a.state, t_a.opt_state,
                    meta={"epoch": 1, "global_step": t_a.global_step})
    t_b = Trainer(model, hp4)
    start = t_b.resume_from(ckpt)
    assert start == 2
    t_b.fit(params, state, data, data, by_split, seed=0, log_fn=None,
            start_epoch=start)

    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(t_full.params),
            jax.tree_util.tree_leaves_with_path(t_b.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))
    # and the epoch numbering continued (2 epochs of metrics, ids 2 and 3)
    assert [m["epoch"] for m in t_b.metric_scores] == [2, 3]


def test_profile_dir_writes_trace(rng, tmp_path):
    """Trainer.fit(profile_dir=...) produces a jax.profiler trace
    (SURVEY §5 tracing/profiling subsystem)."""
    from tests.test_models import build_toy, HP
    from subgnn_tpu.data.dataset import SubgraphData
    hp = HP.replace(max_epochs=1, batch_size=6)
    model, params, state, batch, anchors, _ = build_toy(hp, rng)
    data = SubgraphData(
        subgraph_ids=np.asarray(batch["cc_ids"])[:, 0, :],
        cc_ids=np.asarray(batch["cc_ids"]),
        labels=np.array([0, 1, 2, 0, 1, 2]),
        NP_sim=np.asarray(batch["NP_sim"]),
        I_S_sim=np.asarray(batch["I_S_sim"]),
        B_S_sim=np.asarray(batch["B_S_sim"]),
    )
    t = Trainer(model, hp)
    t.fit(params, state, data, data, {"train": anchors, "val": anchors},
          seed=0, log_fn=None, profile_dir=str(tmp_path / "trace"))
    produced = list((tmp_path / "trace").rglob("*"))
    assert any(p.is_file() for p in produced), produced


def test_filtered_restore_keeps_extra_layers(tmp_path):
    """Restoring an n_layers=2 checkpoint into an n_layers=3 model must
    keep the third layer's init (the reference's filtered state_dict
    intersection keeps unmatched current weights, train.py:264-273) —
    list subtrees merge positionally, never truncate."""
    saved = {"channels": [np.full((2, 2), 1.0), np.full((2, 2), 2.0)],
             "head": np.full(3, 5.0)}
    ckpt = tmp_path / "two_layers.ckpt"
    save_checkpoint(ckpt, saved)
    current = {"channels": [np.zeros((2, 2)), np.zeros((2, 2)),
                            np.full((2, 2), 9.0)],
               "head": np.zeros(3)}
    merged = load_params_filtered(ckpt, current)
    assert len(merged["channels"]) == 3
    np.testing.assert_array_equal(merged["channels"][0], 1.0)
    np.testing.assert_array_equal(merged["channels"][1], 2.0)
    np.testing.assert_array_equal(merged["channels"][2], 9.0)  # kept init
    np.testing.assert_array_equal(merged["head"], 5.0)


def test_topk_checkpoints_ignore_nan_monitor(tmp_path):
    """A NaN monitored metric (degenerate-split AUROC) must never be
    saved/ranked: NaN compares False everywhere, so it would otherwise
    save every epoch and leave best_path arbitrary."""
    ck = TopKCheckpoints(tmp_path, k=2, monitor="val_auroc")
    p = {"w": np.zeros(2)}
    assert not ck.maybe_save(0, {"val_auroc": float("nan")}, p)
    assert ck.best_path is None
    assert ck.maybe_save(1, {"val_auroc": 0.5}, p)
    assert not ck.maybe_save(2, {"val_auroc": float("nan")}, p)
    assert ck.best_path == ck.kept[0][1]
    assert ck.kept[0][0] == 0.5


def test_refit_resets_run_state(rng):
    """A second fit() on the same Trainer is a fresh run: metric history
    and top-k checkpoint ranking must not span both runs."""
    import __graft_entry__ as ge

    model, hp, params, state, data, anchors, eval_cc = \
        ge._build_training_fixture(
            n_train=16, n_val=8,
            hp_overrides=dict(batch_size=8, max_epochs=2))
    tr = Trainer(model, hp, eval_cc_tables=eval_cc)
    tr.fit(params, state, data["train"], data["val"], anchors,
           seed=0, log_fn=None)
    first = [m["epoch"] for m in tr.metric_scores]
    tr.fit(params, state, data["train"], data["val"], anchors,
           seed=1, log_fn=None)
    assert [m["epoch"] for m in tr.metric_scores] == first == [0, 1]
