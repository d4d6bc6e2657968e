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
from . import metrics as M
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
                 tb_dir: Optional[str] = None):
        self.model = model
        self.hp = hp
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

    # ---------------------------------------------------------- step builders

    def _build_steps(self, anchors_by_split):
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
            return params, opt_state, new_state, loss, logits

        def eval_step(params, state, batch, anchors, cc_tables):
            logits, _ = model.forward(params, state, batch, anchors,
                                      train=False, rng=None,
                                      cc_tables=cc_tables)
            loss = model.loss_fn(logits, batch["label"], batch["valid"])
            return loss, logits

        self._train_step = jax.jit(train_step)
        self._eval_step = jax.jit(eval_step, static_argnames=())

    # ----------------------------------------------------------------- eval

    def evaluate(self, data, anchors, split: str = "val") -> Dict[str, Any]:
        """Run the eval loop and aggregate metrics with the reference's key
        names (reference: SubGNN.py:408-504)."""
        model, hp = self.model, self.hp
        cc_tables = None
        if hp.trainable_cc:
            cc_tables = self.eval_cc_tables.get(split,
                                                self.params.get("train_cc"))
        logits_all, labels_all, losses, accs, f1s = [], [], [], [], []
        for batch in data.batches(hp.batch_size, shuffle=False, drop_last=False):
            valid = batch["valid"]
            jbatch = {k: (jnp.asarray(v) if v is not None else None)
                      for k, v in batch.items()}
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
        self.params, self.state = params, state
        self.opt_state = self.tx.init(params)
        if getattr(self, "_resume", None) is not None:
            r = self._resume
            self.params = jax.tree_util.tree_map(jnp.asarray, r["params"])
            if r["state"] is not None:
                self.state = jax.tree_util.tree_map(jnp.asarray, r["state"])
            if r["opt_state"] is not None:
                self.opt_state = jax.tree_util.tree_map(
                    jnp.asarray, r["opt_state"],
                    is_leaf=lambda x: x is None)
            self._resume = None
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        self._build_steps(anchors_by_split)
        base_rng = jax.random.PRNGKey(seed)
        rng_np = np.random.default_rng(seed)
        drop_last = hp.batch_size <= len(train_data)

        edges_per_step = mpn_edges_per_step(hp, hp.batch_size,
                                            train_data.cc_ids.shape[1])
        for epoch in range(hp.max_epochs):
            t0 = time.time()
            train_losses = []
            for batch in train_data.batches(hp.batch_size, shuffle=True,
                                            drop_last=drop_last, rng=rng_np):
                jbatch = {k: (jnp.asarray(v) if v is not None else None)
                          for k, v in batch.items()}
                rng = jax.random.fold_in(base_rng, self.global_step)
                (self.params, self.opt_state, self.state, loss,
                 _) = self._train_step(self.params, self.opt_state, self.state,
                                       jbatch, anchors_by_split["train"], rng)
                train_losses.append(float(loss))
                self.global_step += 1
            train_time = time.time() - t0

            val_metrics = self.evaluate(val_data, anchors_by_split["val"], "val")
            val_metrics["train_loss"] = float(np.mean(train_losses))
            val_metrics["epoch"] = epoch
            val_metrics["epoch_time_s"] = time.time() - t0
            val_metrics["train_edges_per_s"] = (
                edges_per_step * len(train_losses) / max(train_time, 1e-9))
            self.metric_scores.append(val_metrics)
            if self.tb:
                self.tb.add_scalars(val_metrics, epoch)
            if self.ckpt:
                self.ckpt.maybe_save(epoch, val_metrics, self.params,
                                     self.state, self.opt_state)
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
                    anchors_by_split.update(new_anchors)
        if profile_dir:
            jax.profiler.stop_trace()
        return self.metric_scores[-1] if self.metric_scores else {}

    def best_monitor_value(self) -> float:
        vals = [m[self.monitor] for m in self.metric_scores
                if self.monitor in m]
        return float(np.max(vals)) if vals else float("nan")
