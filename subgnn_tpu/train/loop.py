"""JIT-compiled training loop (replaces the PyTorch-Lightning runtime).

Reference runtime: pl.Trainer with Adam, global-norm gradient clipping,
per-epoch validation with metric aggregation, top-3 checkpointing on the
monitored metric (reference: SubGNN/train_config.py:109-158,
SubGNN/SubGNN.py:317-504,1156-1161).

Here: a single jitted train step (forward + grads + optax update) and a
jitted eval step; batches stream from host with static shapes so each step
compiles exactly once per split.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import HParams
from ..models.subgnn import SubGNNModel
from ..parallel import mesh as MX
from . import metrics as M
from . import plans as P
from . import sims as S

# combined NP-sim bytes (train+val) above which the trainer switches to
# host-gathered anchor-column similarities (train/sims.py) instead of
# keeping the (n_sub, C, n_nodes) tensors device-resident
COMPACT_NP_SIM_BYTES = 256 << 20
from .checkpoint import TopKCheckpoints
from .tb_writer import TBWriter


def mpn_edges_per_step(hp: HParams, batch_size: int, max_n_cc: int) -> int:
    """Anchor-patch->CC message edges processed by one training step (the
    throughput unit of bench.py and the per-epoch counters)."""
    per_layer = 0
    if hp.use_neighborhood:
        per_layer += hp.n_anchor_patches_N_in + hp.n_anchor_patches_N_out
    if hp.use_position:
        per_layer += hp.n_anchor_patches_pos_in + hp.n_anchor_patches_pos_out
    if hp.use_structure:
        per_layer += 2 * hp.n_anchor_patches_structure
    return batch_size * max_n_cc * per_layer * hp.n_layers


def make_optimizer(hp: HParams):
    """Adam + optional global-norm clipping; node embeddings frozen when
    freeze_node_embeds (reference: SubGNN.py:568,1156-1161; PL
    gradient_clip_val clips by global norm)."""
    tx = optax.adam(hp.learning_rate)
    if hp.grad_clip and hp.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(hp.grad_clip), tx)
    if hp.freeze_node_embeds:
        def label_fn(params):
            return {k: ("frozen" if k == "node_embed" else "train")
                    for k in params}
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn)
    return tx


class Trainer:
    def __init__(self, model: SubGNNModel, hp: HParams,
                 ckpt_dir: Optional[str] = None,
                 monitor: str = "val_micro_f1", checkpoint_k: int = 3,
                 eval_cc_tables: Optional[Dict[str, Any]] = None,
                 tb_dir: Optional[str] = None, mesh=None):
        self.model = model
        self.hp = hp
        # multi-chip: mesh comes in explicitly or from the
        # mesh_data_axis/mesh_node_axis hyperparameters; every data/param
        # placement below then goes through _place() with named shardings
        self.mesh = mesh if mesh is not None else MX.mesh_from_hparams(hp)
        self.monitor = monitor
        self.ckpt = (TopKCheckpoints(ckpt_dir, checkpoint_k, monitor)
                     if ckpt_dir else None)
        self.tb = TBWriter(tb_dir) if tb_dir else None
        self.metric_scores = []  # per-epoch dicts (reference: SubGNN.py:190)
        self.eval_cc_tables = eval_cc_tables or {}
        self.tx = make_optimizer(hp)
        self._train_step = None
        self._eval_step = None
        self.params = None
        self.state = None
        self.opt_state = None
        self.global_step = 0
        self._grad_norms = []
        # None = auto by NP-sim size (see fit); set True/False to force
        self.compact_sims: Optional[bool] = None
        if hp.debug_mode:
            # NaN/inf checking inside jit, the reference's always-on
            # torch.autograd.set_detect_anomaly analog (train.py:439)
            jax.config.update("jax_debug_nans", True)

    # ---------------------------------------------------------- step builders

    def _build_steps(self):
        model, hp = self.model, self.hp

        def train_step(params, opt_state, state, batch, anchors, rng):
            def loss_fn(p):
                logits, new_state = model.forward(
                    p, state, batch, anchors, train=True, rng=rng,
                    cc_tables=p.get("train_cc"))
                loss = model.loss_fn(logits, batch["label"], batch["valid"])
                return loss, (logits, new_state)

            (loss, (logits, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            grad_norm = (optax.global_norm(grads) if hp.debug_mode
                         else jnp.float32(0))
            return params, opt_state, new_state, loss, logits, grad_norm

        def eval_step(params, state, batch, anchors, cc_tables):
            logits, _ = model.forward(params, state, batch, anchors,
                                      train=False, rng=None,
                                      cc_tables=cc_tables)
            loss = model.loss_fn(logits, batch["label"], batch["valid"])
            return loss, logits

        # donate (params, opt_state, state): the Adam update rewrites every
        # leaf, so XLA aliases the outputs onto the input buffers — no
        # per-step copy of the table + moments (fit() copies the caller's
        # pytrees once up front, so donation never invalidates caller state).
        # debug_mode keeps the buffers: jax_debug_nans re-executes the step
        # eagerly with the ORIGINAL arguments to localize a NaN, which
        # donated (deleted) buffers would turn into a RuntimeError.
        donate = () if hp.debug_mode else (0, 1, 2)
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._eval_step = jax.jit(eval_step, static_argnames=())

    # ---------------------------------------------------------------- mesh

    def _place(self, tree, pspecs=None):
        """Put a pytree on the mesh with the given PartitionSpecs
        (replicated when pspecs is None); identity without a mesh."""
        if self.mesh is None:
            return tree
        if pspecs is None:
            pspecs = jax.tree_util.tree_map(
                lambda _: MX.P(), tree, is_leaf=lambda x: x is None)
        return MX.shard_tree(self.mesh, tree, pspecs)

    def _shard_params_opt(self):
        """Shard params by param_pspecs, then re-place the existing
        optimizer state (fresh or checkpoint-resumed) with the shardings a
        mesh-native tx.init produces (zeros_like under jit inherits the
        param shardings)."""
        if self.mesh is None:
            return
        self.params = MX.shard_tree(self.mesh, self.params,
                                    MX.param_pspecs(self.params))
        # eager init: zeros_like inherits each param's NamedSharding (a
        # jitted init would NOT — constants have no data dependence on the
        # input, so GSPMD leaves them single-device); scalars (step counts)
        # replicate explicitly
        fresh = self.tx.init(self.params)
        replicated = MX.NamedSharding(self.mesh, MX.P())

        def place(f, o):
            if o is None:
                return None
            sh = (f.sharding if isinstance(f.sharding, MX.NamedSharding)
                  else replicated)
            return jax.device_put(jnp.asarray(o), sh)

        self.opt_state = jax.tree_util.tree_map(
            place, fresh, self.opt_state, is_leaf=lambda x: x is None)

    # ------------------------------------------------------- fused epochs

    @staticmethod
    def _device_split(data, include_np_sim: bool = True) -> Dict[str, Any]:
        """Move a whole split's arrays to device once (fused-epoch mode)."""
        return {
            "cc_ids": jnp.asarray(data.cc_ids),
            "label": jnp.asarray(data.labels),
            "NP_sim": (jnp.asarray(data.NP_sim)
                       if data.NP_sim is not None and include_np_sim else None),
            "I_S_sim": jnp.asarray(data.I_S_sim) if data.I_S_sim is not None else None,
            "B_S_sim": jnp.asarray(data.B_S_sim) if data.B_S_sim is not None else None,
        }

    @staticmethod
    def _gather_batch(split_arrays, idx, valid):
        batch = {k: (v[idx] if v is not None else None)
                 for k, v in split_arrays.items()}
        batch["subgraph_idx"] = idx
        batch["valid"] = valid
        return batch

    def _build_fused(self, train_arrays, val_arrays, base_rng):
        """One dispatch per train epoch and one per eval epoch: lax.scan
        over the epoch's batch index matrix with the split arrays resident
        on device. Removes the per-step host->device round trip, which
        dominates wall time when the host link is remote. Anchors are jit
        ARGUMENTS (not closed over): per-epoch anchor resampling
        (resample_anchor_patches, reference SubGNN.py:448-460) swaps in
        same-shaped arrays without recompiling, so resample configs stay
        on the one-dispatch-per-epoch fast path. The split arrays are ALSO
        jit arguments: closed-over device arrays are embedded verbatim in
        the serialized HLO, which at EM-USER scale overflows the axon
        remote-compile request limit (HTTP 413)."""
        model, hp, tx = self.model, self.hp, self.tx

        def train_epoch(params, opt_state, state, order, step0, extras,
                        train_anchors, train_arrays):
            # order: (n_batches, B) int32 of subgraph indices; extras: dict
            # of per-batch-stacked GatherPlans (train/plans.py) and compact
            # anchor-column sims (train/sims.py)
            def body(carry, inp):
                params, opt_state, state, step = carry
                idx, extras_b = inp
                batch = self._gather_batch(train_arrays, idx,
                                           jnp.ones_like(idx, bool))
                batch.update(extras_b)
                rng = jax.random.fold_in(base_rng, step)

                def loss_fn(p):
                    logits, new_state = model.forward(
                        p, state, batch, train_anchors, train=True, rng=rng,
                        cc_tables=p.get("train_cc"))
                    loss = model.loss_fn(logits, batch["label"], batch["valid"])
                    return loss, new_state

                (loss, new_state), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, new_state, step + 1), loss

            (params, opt_state, state, _), losses = jax.lax.scan(
                body, (params, opt_state, state, step0), (order, extras))
            return params, opt_state, state, losses

        def eval_epoch(params, state, order, valid, cc_tables, extras,
                       val_anchors, val_arrays):
            def body(_, inp):
                idx, v, extras_b = inp
                batch = self._gather_batch(val_arrays, idx, v)
                batch.update(extras_b)
                logits, _ = model.forward(params, state, batch, val_anchors,
                                          train=False, rng=None,
                                          cc_tables=cc_tables)
                loss = model.loss_fn(logits, batch["label"], batch["valid"])
                return None, (loss, logits)

            _, (losses, logits) = jax.lax.scan(body, None,
                                               (order, valid, extras))
            return losses, logits

        # donate the scan carry (params, opt_state, state) — same aliasing
        # as the streaming step, once per epoch dispatch
        self._fused_train_epoch = jax.jit(train_epoch,
                                          donate_argnums=(0, 1, 2))
        self._fused_eval_epoch = jax.jit(eval_epoch)
        self._fused_train_arrays = train_arrays
        self._fused_val_arrays = val_arrays

    @staticmethod
    def _epoch_order(n, batch_size, rng_np, drop_last):
        order = np.arange(n)
        rng_np.shuffle(order)
        n_batches = n // batch_size if drop_last else -(-n // batch_size)
        if n_batches == 0:
            return None
        take = order[: n_batches * batch_size]
        if len(take) < n_batches * batch_size:
            take = np.concatenate(
                [take, np.zeros(n_batches * batch_size - len(take), np.int64)])
        return take.reshape(n_batches, batch_size).astype(np.int32)

    @staticmethod
    def _split_bytes(data) -> int:
        total = 0
        for name in ("cc_ids", "NP_sim", "I_S_sim", "B_S_sim"):
            arr = getattr(data, name)
            if arr is not None:
                total += arr.nbytes
        return total

    # ----------------------------------------------------------------- eval

    def _use_compact(self, data) -> bool:
        if data.NP_sim is None:
            return False
        if self.compact_sims is None:
            return data.NP_sim.nbytes > COMPACT_NP_SIM_BYTES
        return bool(self.compact_sims)

    def evaluate(self, data, anchors, split: str = "val") -> Dict[str, Any]:
        """Run the eval loop and aggregate metrics with the reference's key
        names (reference: SubGNN.py:408-504)."""
        model, hp = self.model, self.hp
        compact = self._use_compact(data)
        cc_tables = None
        if hp.trainable_cc:
            cc_tables = self.eval_cc_tables.get(split,
                                                self.params.get("train_cc"))
        logits_all, labels_all, losses, accs, f1s = [], [], [], [], []
        for batch in data.batches(hp.batch_size, shuffle=False, drop_last=False,
                                  include_np_sim=not compact):
            valid = batch["valid"]
            jbatch = {k: (jnp.asarray(v) if v is not None else None)
                      for k, v in batch.items()}
            if compact:
                jbatch.update({k: jnp.asarray(v)
                               for k, v in S.compact_sims_for_batch(
                                   data.NP_sim, anchors, hp,
                                   batch["subgraph_idx"]).items()})
            if self.mesh is not None:
                jbatch = self._place(jbatch, MX.batch_pspecs(jbatch))
            loss, logits = self._eval_step(self.params, self.state, jbatch,
                                           anchors, cc_tables)
            logits = np.asarray(logits)[valid]
            labels = batch["label"][valid]
            logits_all.append(logits)
            labels_all.append(labels)
            losses.append(float(loss))
            accs.append(M.calc_accuracy(logits, labels, model.multilabel))
            f1s.append(M.calc_f1(logits, labels, "macro", model.multilabel))
        logits = np.concatenate(logits_all)
        labels = np.concatenate(labels_all)
        return self._metrics(split, logits, labels, losses, accs, f1s)

    def _metrics(self, split, logits, labels, losses, accs, f1s):
        model = self.model
        p = split  # metric key prefix
        auroc, per_class = M.roc_auc_ovr(logits, labels, model.multilabel)
        out = {
            f"{p}_loss": float(np.mean(losses)),
            f"{p}_micro_f1": M.calc_f1(logits, labels, "micro", model.multilabel),
            f"{p}_macro_f1": M.calc_f1(logits, labels, "macro", model.multilabel),
            f"{p}_acc": M.calc_accuracy(logits, labels, model.multilabel),
            f"avg_{p}_acc": float(np.mean(accs)),
            f"{'avg_macro_f1' if p == 'val' else p + '_avg_macro_f1'}":
                float(np.mean(f1s)),
            f"{p}_auroc": auroc,
        }
        for c, v in enumerate(per_class):
            out[f"{p}_auroc_class_{c}"] = v
        return out

    # ------------------------------------------------------------------ fit

    def resume_from(self, ckpt_path) -> int:
        """Restore params/state/opt_state from a checkpoint; returns the
        epoch to continue from (checkpoint-based restart, the TPU-side
        answer to elastic recovery — the reference has none, SURVEY §5)."""
        from .checkpoint import load_checkpoint
        payload = load_checkpoint(ckpt_path)
        self._resume = payload
        return int(payload["meta"].get("epoch", -1)) + 1

    def fit(self, params, state, train_data, val_data,
            anchors_by_split: Dict[str, Any], seed: int = 0,
            on_epoch_end: Optional[Callable[[int], Dict[str, Any]]] = None,
            log_fn: Optional[Callable[[str], None]] = print,
            start_epoch: int = 0,
            metrics_callback: Optional[Callable[[int, Dict[str, Any]], None]] = None,
            profile_dir: Optional[str] = None) -> Dict[str, Any]:
        hp = self.hp
        # each fit() is a fresh run: without this a re-fit on the same
        # Trainer (HPO re-fits, multi-config tests) would compare its
        # epochs against the PREVIOUS run's metric history and top-k
        # checkpoints (best_monitor_value / best_path spanning both runs)
        self.metric_scores = []
        self._grad_norms = []
        if self.ckpt:
            self.ckpt.kept = []
        # Defensive device copy: the train-step jits donate (params,
        # opt_state, state) so Adam updates write in place (the embedding
        # table + both moments are the largest persistent buffers). One
        # copy here keeps the CALLER's pytrees alive — fit(params, ...)
        # may be called again with the same arrays (multi-config
        # equivalence tests, HPO re-fits).
        copy_tree = lambda t: jax.tree_util.tree_map(
            lambda x: None if x is None else jnp.array(x, copy=True), t,
            is_leaf=lambda x: x is None)
        self.params, self.state = copy_tree(params), copy_tree(state)
        self.global_step = 0  # fresh stream unless a checkpoint restores it
        # own the dict: per-epoch anchor resampling updates it in place, and
        # that must never leak into the caller's test-split anchors (the
        # reference samples test anchors independently at test time,
        # SubGNN.py prepare_test_data) — with or without a mesh
        anchors_by_split = dict(anchors_by_split)
        if getattr(self, "_resume", None) is not None:
            r = self._resume
            self.params = jax.tree_util.tree_map(jnp.asarray, r["params"])
            if r["state"] is not None:
                self.state = jax.tree_util.tree_map(jnp.asarray, r["state"])
            if r["opt_state"] is not None:
                self.opt_state = jax.tree_util.tree_map(
                    jnp.asarray, r["opt_state"],
                    is_leaf=lambda x: x is None)
            else:
                self.opt_state = self.tx.init(self.params)
            # continue the RNG stream where the checkpoint left off
            self.global_step = int(r["meta"].get("global_step", 0))
            self._resume = None
        else:
            # only when NOT resuming: Adam moments are two table-sized
            # buffers, and a resume immediately replaces them
            self.opt_state = self.tx.init(self.params)
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            n_node = self.mesh.shape["node"]
            assert hp.batch_size % n_data == 0, (
                f"batch_size {hp.batch_size} must divide over the 'data' "
                f"mesh axis ({n_data})")
            rows = int(self.params["node_embed"].shape[0])
            assert rows % n_node == 0, (rows, n_node)
            anchors_by_split = {s: self._place(a)
                                for s, a in anchors_by_split.items()}
            self.eval_cc_tables = self._place(self.eval_cc_tables)
        self._shard_params_opt()
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        self._build_steps()
        # scatter-free embedding-table backward (train/plans.py); widths are
        # sticky across epochs so recompiles only happen on growth
        self._plan_builder = P.PlanBuilder(self.params["node_embed"].shape[0])
        base_rng = jax.random.PRNGKey(seed)
        rng_np = np.random.default_rng(seed)
        drop_last = hp.batch_size <= len(train_data)

        # Compact-sims mode: ship host-gathered anchor COLUMNS per batch
        # instead of the device-resident (n_sub, C, n_nodes) NP-sim tensors
        # (train/sims.py). In fused mode this is the DEFAULT at every size:
        # the per-step take_along_axis over the resident tensor is
        # descriptor-bound and dominated the step (92M -> 197M edges/s at
        # the bench shape, PERF.md round 2), while the host gather prefetches
        # behind device compute. The streaming path (per-batch host gather,
        # no prefetch) stays size-gated.
        np_bytes = sum(d.NP_sim.nbytes for d in (train_data, val_data)
                       if d.NP_sim is not None)
        fused_possible = (drop_last
                          and not hp.debug_mode)  # debug: per-step grad norms
        auto_compact = self.compact_sims is None
        if auto_compact:
            self.compact_sims = (fused_possible
                                 or np_bytes > COMPACT_NP_SIM_BYTES)
        compact = bool(self.compact_sims and train_data.NP_sim is not None)

        # Fused-epoch mode: whole split resident on device, one dispatch per
        # train epoch + one per eval. On by default when the split fits and
        # batches are uniform; per-step streaming otherwise (huge datasets,
        # short-batch training, per-epoch anchor resampling).
        resident_bytes = (self._split_bytes(train_data)
                          + self._split_bytes(val_data)
                          - (np_bytes if compact else 0))
        fused = fused_possible and resident_bytes < (1 << 30)
        if auto_compact and not fused:
            self.compact_sims = np_bytes > COMPACT_NP_SIM_BYTES
            compact = bool(self.compact_sims
                           and train_data.NP_sim is not None)
        if fused:
            train_arrays = self._device_split(train_data,
                                              include_np_sim=not compact)
            val_arrays = self._device_split(val_data,
                                            include_np_sim=not compact)
            if self.mesh is not None:
                train_arrays = self._place(train_arrays,
                                           MX.split_pspecs(train_arrays))
                val_arrays = self._place(val_arrays,
                                         MX.split_pspecs(val_arrays))
            self._build_fused(train_arrays, val_arrays, base_rng)
            n_val = len(val_data)
            nb_val = -(-n_val // hp.batch_size)
            val_idx = np.arange(nb_val * hp.batch_size) % n_val
            val_order_np = val_idx.reshape(nb_val, hp.batch_size).astype(np.int32)
            order_spec = MX.P(None, "data")
            val_order = self._place(jnp.asarray(val_order_np), order_spec)
            val_valid = self._place(jnp.asarray(
                (np.arange(nb_val * hp.batch_size) < n_val)
                .reshape(nb_val, hp.batch_size)), order_spec)

            def make_val_extras():
                ve = (S.epoch_compact_sims(val_data.NP_sim,
                                           anchors_by_split["val"], hp,
                                           val_order_np)
                      if compact else {})
                if self.mesh is not None and ve:
                    ve = self._place(ve, MX.epoch_extras_pspecs(ve))
                return ve

            val_extras = make_val_extras()

            def val_cc_tables():
                # same fallback as streaming evaluate(): the train split's
                # learned tables, so fused/streaming mode selection cannot
                # change val semantics when eval_cc_tables lacks the split.
                # Resolved per epoch — the train_cc fallback must track the
                # CURRENT params (the pre-epoch subtree is donated/stale).
                if not hp.trainable_cc:
                    return None
                return self.eval_cc_tables.get(
                    "val", self.params.get("train_cc"))

        edges_per_step = mpn_edges_per_step(hp, hp.batch_size,
                                            train_data.cc_ids.shape[1])

        def prep_epoch():
            """Host-side per-epoch schedule: batch order + GatherPlans +
            compact anchor-column sims, placed on device. Pure host/numpy
            work, so it is prefetched for epoch e+1 while the device runs
            epoch e (dispatch is async; the host only blocks when it reads
            the losses)."""
            # the fused train_epoch marks every row valid
            # (_gather_batch(..., ones)): a drop_last=False order here
            # would train pad rows (duplicated subgraph 0) at full loss
            # weight — fused_possible guarantees this, assert it locally
            assert drop_last, "fused epochs require drop_last batch order"
            order = self._epoch_order(len(train_data), hp.batch_size,
                                      rng_np, drop_last)
            extras = P.epoch_plans(self._plan_builder, hp,
                                   train_data.cc_ids,
                                   anchors_by_split["train"], order)
            if compact:
                extras.update(S.epoch_compact_sims(
                    train_data.NP_sim, anchors_by_split["train"], hp,
                    order))
            order_dev = jnp.asarray(order)
            if self.mesh is not None:
                order_dev = self._place(order_dev, MX.P(None, "data"))
                if extras:
                    extras = self._place(
                        extras, MX.epoch_extras_pspecs(extras))
            return order, order_dev, extras

        # checkpoint-based restart: skip to start_epoch, consuming the same
        # per-epoch shuffle draws the uninterrupted run made (one shuffle of
        # the train order per epoch in both fused and streaming modes —
        # BEFORE the initial prefetch, which draws start_epoch's order), so
        # a resumed run continues the exact trajectory (global_step — and
        # with it the dropout/resample RNG stream — is restored from the
        # checkpoint meta in resume_from)
        for _ in range(start_epoch):
            rng_np.shuffle(np.arange(len(train_data)))
        # anchors feed the plans, so prefetch is only valid while they are
        # fixed across epochs (resampling rebuilds the schedule in-loop)
        prefetch = fused and not hp.resample_anchor_patches
        pending = prep_epoch() if prefetch else None
        for epoch in range(start_epoch, hp.max_epochs):
            t0 = time.time()
            if fused:
                order, order_dev, extras = (pending if pending is not None
                                            else prep_epoch())
                (self.params, self.opt_state, self.state,
                 losses) = self._fused_train_epoch(
                     self.params, self.opt_state, self.state,
                     order_dev, jnp.int32(self.global_step), extras,
                     anchors_by_split["train"], self._fused_train_arrays)
                self.global_step += order.shape[0]
                # overlap: build epoch e+1's schedule before blocking on
                # epoch e's device losses
                pending = (prep_epoch()
                           if prefetch and epoch + 1 < hp.max_epochs
                           else None)
                train_losses = list(np.asarray(losses, np.float64))
            else:
                train_losses = []
                for batch in train_data.batches(hp.batch_size, shuffle=True,
                                                drop_last=drop_last, rng=rng_np,
                                                include_np_sim=not compact):
                    jbatch = {k: (jnp.asarray(v) if v is not None else None)
                              for k, v in batch.items()}
                    jbatch.update(P.batch_plans(
                        self._plan_builder, hp, batch["cc_ids"],
                        anchors_by_split["train"], batch["subgraph_idx"]))
                    if compact:
                        jbatch.update({
                            k: jnp.asarray(v)
                            for k, v in S.compact_sims_for_batch(
                                train_data.NP_sim,
                                anchors_by_split["train"], hp,
                                batch["subgraph_idx"]).items()})
                    if self.mesh is not None:
                        jbatch = self._place(jbatch, MX.batch_pspecs(jbatch))
                    rng = jax.random.fold_in(base_rng, self.global_step)
                    (self.params, self.opt_state, self.state, loss,
                     _, gnorm) = self._train_step(self.params, self.opt_state,
                                                  self.state, jbatch,
                                                  anchors_by_split["train"],
                                                  rng)
                    train_losses.append(float(loss))
                    if hp.debug_mode:
                        self._grad_norms.append(float(gnorm))
                    self.global_step += 1
            train_time = time.time() - t0

            if fused:
                v_losses, v_logits = self._fused_eval_epoch(
                    self.params, self.state, val_order, val_valid,
                    val_cc_tables(), val_extras, anchors_by_split["val"],
                    self._fused_val_arrays)
                v_logits = np.asarray(v_logits)
                v_valid = np.asarray(val_valid)
                flat_logits = v_logits.reshape(-1, v_logits.shape[-1])[
                    v_valid.reshape(-1)]
                labels_np = np.asarray(val_data.labels)
                order_np = np.asarray(val_order)
                flat_labels = labels_np[order_np.reshape(-1)[
                    v_valid.reshape(-1)]]
                # per-BATCH acc/macro-F1 means, exactly like the streaming
                # evaluate() loop and the reference's epoch-end aggregation
                # (SubGNN.py:408-464) — macro-F1 is non-linear, so a
                # whole-split value would differ from the per-batch mean
                accs, f1s = [], []
                for i in range(v_logits.shape[0]):
                    m = v_valid[i]
                    lg, lb = v_logits[i][m], labels_np[order_np[i][m]]
                    accs.append(M.calc_accuracy(lg, lb, self.model.multilabel))
                    f1s.append(M.calc_f1(lg, lb, "macro",
                                         self.model.multilabel))
                val_metrics = self._metrics(
                    "val", flat_logits, flat_labels,
                    list(np.asarray(v_losses, np.float64)), accs, f1s)
            else:
                val_metrics = self.evaluate(val_data, anchors_by_split["val"],
                                            "val")
            val_metrics["train_loss"] = float(np.mean(train_losses))
            val_metrics["epoch"] = epoch
            val_metrics["epoch_time_s"] = time.time() - t0
            val_metrics["train_edges_per_s"] = (
                edges_per_step * len(train_losses) / max(train_time, 1e-9))
            if hp.debug_mode and self._grad_norms:
                val_metrics["grad_norm"] = float(np.mean(
                    self._grad_norms[-max(len(train_losses), 1):]))
            self.metric_scores.append(val_metrics)
            if self.tb:
                self.tb.add_scalars(val_metrics, epoch)
            if self.ckpt:
                self.ckpt.maybe_save(epoch, val_metrics, self.params,
                                     self.state, self.opt_state,
                                     global_step=self.global_step)
            if log_fn:
                log_fn(f"epoch {epoch}: train_loss={val_metrics['train_loss']:.4f} "
                       f"val_micro_f1={val_metrics['val_micro_f1']:.4f} "
                       f"val_acc={val_metrics['val_acc']:.4f} "
                       f"val_auroc={val_metrics['val_auroc']:.4f} "
                       f"({val_metrics['epoch_time_s']:.1f}s)")
            if metrics_callback is not None:
                metrics_callback(epoch, val_metrics)  # may raise (pruning)
            if on_epoch_end is not None:
                new_anchors = on_epoch_end(epoch)
                if new_anchors:
                    if self.mesh is not None:
                        new_anchors = {s: self._place(a)
                                       for s, a in new_anchors.items()}
                    anchors_by_split.update(new_anchors)
                    if fused and compact:
                        # val anchor columns changed with the anchors
                        val_extras = make_val_extras()
                    if pending is not None:
                        # a prefetched schedule embeds plans/sims built
                        # from the OLD anchors — rebuild next epoch
                        pending = None
        if profile_dir:
            jax.profiler.stop_trace()
        return self.metric_scores[-1] if self.metric_scores else {}

    def lr_find(self, params, state, train_data, anchors_by_split,
                seed: int = 0, min_lr: float = 1e-6, max_lr: float = 3e-2,
                num_steps: int = 60, beta: float = 0.9,
                damping: float = 3.0) -> float:
        """LR range test (the reference enables PL's auto_lr_find for several
        frozen configs, e.g. best_model_hyperparameters/density/
        all_density_hyperparams.json): sweep lr geometrically over one-batch
        steps, track the EMA of the loss, and suggest the lr at the steepest
        descent of the smoothed curve (PL's 'suggestion()' heuristic)."""
        hp = self.hp
        model = self.model
        base_rng = jax.random.PRNGKey(seed)
        rng_np = np.random.default_rng(seed)
        lrs = np.geomspace(min_lr, max_lr, num_steps)
        anchors = anchors_by_split["train"]

        sched_tx = optax.chain(
            optax.clip_by_global_norm(hp.grad_clip) if hp.grad_clip else optax.identity(),
            optax.inject_hyperparams(optax.adam)(learning_rate=1e-3))
        opt_state = sched_tx.init(params)

        @jax.jit
        def step(params, opt_state, batch, rng, lr, anchors):
            def loss_fn(p):
                logits, _ = model.forward(p, state, batch, anchors,
                                          train=True, rng=rng,
                                          cc_tables=p.get("train_cc"))
                return model.loss_fn(logits, batch["label"], batch["valid"])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            if hp.freeze_node_embeds:
                # match make_optimizer's mask: sweeping the LR with the
                # (large) frozen table trainable would bias the suggestion
                grads = dict(grads)
                grads["node_embed"] = jnp.zeros_like(grads["node_embed"])
            opt_state[-1].hyperparams["learning_rate"] = lr  # injected lr
            updates, new_opt = sched_tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        losses = []
        smoothed = None
        it = 0
        p, o = params, opt_state
        drop_last = hp.batch_size <= len(train_data)
        while it < num_steps:
            for batch in train_data.batches(hp.batch_size, shuffle=True,
                                            drop_last=drop_last, rng=rng_np):
                if it >= num_steps:
                    break
                jbatch = {k: (jnp.asarray(v) if v is not None else None)
                          for k, v in batch.items()}
                p, o, loss = step(p, o, jbatch,
                                  jax.random.fold_in(base_rng, it),
                                  jnp.float32(lrs[it]), anchors)
                loss = float(loss)
                if not np.isfinite(loss):
                    num_steps = it  # diverged: truncate the sweep
                    break
                smoothed = loss if smoothed is None else (
                    beta * smoothed + (1 - beta) * loss)
                losses.append(smoothed)
                it += 1
        if len(losses) < 5:
            return hp.learning_rate
        grad = np.gradient(np.asarray(losses))
        best = int(np.argmin(grad[: len(losses)]))
        # the steepest-descent point sits just below the divergence edge;
        # damp it (multi-seed tests: the raw pick trains val fine but
        # generalizes worse on small datasets)
        return float(lrs[min(best, len(lrs) - 1)]) / damping

    def best_monitor_value(self) -> float:
        # the reference's HPO objective takes min over epochs exactly when
        # monitoring val_loss, max otherwise (train.py:432-435); without
        # this a minimize-direction study would optimize each trial's
        # WORST epoch
        vals = [m[self.monitor] for m in self.metric_scores
                if self.monitor in m]
        if not vals:
            return float("nan")
        return float(np.min(vals) if self.monitor == "val_loss"
                     else np.max(vals))
