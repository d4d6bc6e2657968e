"""No large arrays may be CLOSED OVER by the Trainer's jitted programs.

Closed-over device arrays become jaxpr constants and are embedded
verbatim in the serialized HLO module. Over the axon TPU tunnel the
module is shipped by HTTP for remote compilation, and at EM-USER scale
(57k nodes) embedded split arrays overflowed the request-size limit
(HTTP 413). Everything big — split arrays, anchors, plans, sims —
must travel as jit ARGUMENTS.

The test records every (function, args) pair the Trainer jits during a
real fused-epoch fit, re-traces each with jax.make_jaxpr, and asserts
every captured constant is small.
"""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

MAX_CONST_BYTES = 64 * 1024


def _const_nbytes(c):
    try:
        return int(np.asarray(c).nbytes)
    except Exception:
        return 0


def test_trainer_jits_have_no_large_closure_constants(monkeypatch):
    import __graft_entry__ as ge
    import subgnn_tpu.train.loop  # noqa: F401 (resolves jax.jit at call time)
    from subgnn_tpu.train.loop import Trainer

    recorded = {}
    real_jit = jax.jit

    def recording_jit(fn, **kw):
        jitted = real_jit(fn, **kw)

        def wrapper(*args, **kwargs):
            recorded.setdefault(getattr(fn, "__name__", "?"),
                                 (fn, args, kwargs))
            return jitted(*args, **kwargs)

        return wrapper

    monkeypatch.setattr(jax, "jit", recording_jit)

    model, hp, params, state, data, anchors, eval_cc = (
        ge._build_training_fixture(
            n_nodes=64, n_train=8, n_val=4, C=2, L=4,
            hp_overrides=dict(batch_size=4, max_epochs=1)))
    trainer = Trainer(model, hp, eval_cc_tables=eval_cc)
    trainer.fit(params, state, data["train"], data["val"], anchors,
                seed=0, log_fn=None)

    monkeypatch.undo()

    assert "train_epoch" in recorded, sorted(recorded)  # fused mode engaged
    assert "eval_epoch" in recorded, sorted(recorded)
    for name, (fn, args, kwargs) in recorded.items():
        jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
        big = [(_const_nbytes(c)) for c in jaxpr.consts
               if _const_nbytes(c) > MAX_CONST_BYTES]
        assert not big, (
            f"{name} closes over {len(big)} constant(s) of sizes {big} bytes"
            " — pass them as jit arguments (axon remote-compile HTTP 413)")


def test_node_emb_steps_have_no_large_closure_constants(monkeypatch):
    """Same property for the node-embedding pretrainer (the function that
    actually hit the 413 at 57k nodes)."""
    from subgnn_tpu.data.graph import CSRGraph
    from subgnn_tpu.prepare import node_emb

    recorded = {}
    real_jit = jax.jit

    def recording_jit(fn, **kw):
        jitted = real_jit(fn, **kw)

        def wrapper(*args, **kwargs):
            recorded.setdefault(getattr(fn, "__name__", "?"),
                                 (fn, args, kwargs))
            return jitted(*args, **kwargs)

        return wrapper

    monkeypatch.setattr(jax, "jit", recording_jit)

    rng = np.random.default_rng(0)
    n = 40
    edges = set()
    for v in range(2, n + 1):  # connected: chain + random extras
        edges.add((v - 1, v))
    for _ in range(60):
        u, v = sorted(rng.integers(1, n + 1, 2))
        if u != v:
            edges.add((u, v))
    graph = CSRGraph.from_edges(np.asarray(sorted(edges)), n_nodes=n)

    for minibatch in ("full", "graphsaint"):
        node_emb.train_node_embeddings(
            graph, epochs=2, minibatch=minibatch, batch_size=8,
            walk_length=4, num_steps=2, hidden=16, out_dim=8)

    monkeypatch.undo()

    # the fused drivers are the dispatch boundary (step/saint_step are
    # invoked under their traces, so their recorded args are tracers)
    assert "full_run_chunk" in recorded, sorted(recorded)
    assert "saint_run_chunk" in recorded, sorted(recorded)
    for name, (fn, args, kwargs) in recorded.items():
        leaves = jax.tree_util.tree_leaves(args)
        if any(isinstance(x, jax.core.Tracer) for x in leaves):
            continue  # recorded inside another trace; covered by its parent
        if name == "_plain_walks_device":
            continue  # module-level jit with static argnames, args are arrays
        jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
        big = [(_const_nbytes(c)) for c in jaxpr.consts
               if _const_nbytes(c) > MAX_CONST_BYTES]
        assert not big, (
            f"{name} closes over {len(big)} constant(s) of sizes {big} bytes"
            " — pass them as jit arguments (axon remote-compile HTTP 413)")
