"""End-to-end pipeline: load -> precompute -> anchors -> train -> test.

Mirrors the reference flow (reference: SubGNN/train_config.py:160-200 driving
SubGNN.prepare_data at SubGNN/SubGNN.py:1024-1063 and prepare_test_data at
:994-1022) as an explicit, cache-aware pipeline object.
"""
from __future__ import annotations

import json
import threading as _threading
from collections import OrderedDict as _OrderedDict
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HParams, RunConfig
from ..data.graph import CSRGraph
from ..data.subgraphs import read_subgraphs, reindex_subgraphs, MultiLabelBinarizer
from ..data.dataset import SubgraphData, initialize_cc_ids
from ..precompute.shortest_paths import (shortest_path_matrix,
                                         shortest_path_rows)
from ..precompute.border import border_sets_from_rows, compute_border_sets
from ..precompute.similarities import (
    cached, compute_shortest_path_similarities, compute_structure_similarities,
    structure_similarities_both, np_sim_path, border_set_path,
    struc_patches_path, struc_walks_path, struc_sim_path)
from ..sampling.walks import sample_structure_anchor_patches, perform_random_walks
from ..sampling.anchors import (
    init_anchors_neighborhood, init_anchors_pos_int, init_anchors_pos_ext,
    init_anchors_structure)
from ..models.subgnn import SubGNNModel, CHANNEL_CC_KEYS
from .loop import Trainer, make_optimizer
from .checkpoint import dump_json, load_checkpoint, load_params_filtered

SPLITS = ("train", "val", "test")
SPLIT_TAG = {"train": 0, "val": 1, "test": 2}
PAD_VALUE = 0

# above this node count the (n, n) all-pairs matrix (>= 1.6 GB and growing
# quadratically) is never materialized; NP sims BFS from CC sources only
_FULL_SP_MAX_NODES = 20_000

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | Path | None = None):
    """Persistent XLA compilation cache: repeated runs (multi-seed
    harness, HPO trials) reuse compiled binaries across processes instead
    of recompiling — compile time dominates wall time on a remote-attached
    chip."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    path = Path(path) if path else Path(__file__).resolve().parents[2] / ".jax_cache"
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED = True
    except Exception:
        pass


def load_embeddings(path: Path) -> np.ndarray:
    """Load pretrained node embeddings: .pth (torch tensor) or .npy."""
    npy = path.with_suffix(".npy")
    if path.suffix == ".pth" and path.exists():
        import torch
        t = torch.load(str(path), map_location="cpu", weights_only=False)
        return np.asarray(t.detach().numpy() if hasattr(t, "detach") else t,
                          dtype=np.float32)
    if npy.exists():
        return np.load(npy).astype(np.float32)
    raise FileNotFoundError(path)


class SubGNNPipeline:
    # serving: max shortest-path rows LRU-cached across predict() calls
    # (~229 KB/row at 57k nodes -> ~470 MB cap; see predict._bfs_np_sim)
    BFS_ROW_CACHE_SIZE = 2048

    def __init__(self, run_config: RunConfig, hp: HParams,
                 results_dir: Optional[str | Path] = None,
                 checkpoint_k: int = 3,
                 train_holdout: Optional[np.ndarray] = None):
        enable_compilation_cache()
        self.rc = run_config
        self.hp = hp
        self.results_dir = Path(results_dir) if results_dir else None
        self.checkpoint_k = checkpoint_k  # 0 disables checkpointing
        # train-split indices carved out for NESTED model selection: fit
        # never sees them; after the best-val checkpoint restore they are
        # scored like a non-train split (run() returns out['holdout']).
        # This estimates the 10-seed protocol's quantity (test score of the
        # best-val checkpoint) without touching val or test — round 4
        # measured best-val-over-epochs saturating at ~0.9 for EVERY
        # channel subset on 25-example val splits while test scores ranged
        # 0.49-0.88 (RESULTS.md), so HPO objectives need this.
        self.train_holdout = (None if train_holdout is None
                              else np.unique(np.asarray(train_holdout,
                                                        np.int64)))
        self._loaded = False

    # ------------------------------------------------------------------ load

    def load(self):
        """Read graph/subgraphs/embeddings (reference: SubGNN.py:519-570)."""
        rc, hp = self.rc, self.hp
        self.graph = CSRGraph.from_edgelist(rc.graph_path())
        (tr, trl, va, val, te, tel, multilabel) = read_subgraphs(
            rc.subgraphs_path())
        self.multilabel = multilabel
        if multilabel:
            self.binarizer = MultiLabelBinarizer().fit(
                list(trl) + list(val) + list(tel))
            # the label-matrix width — NOT max(id)+1: label ids are assigned
            # in file order over every line incl. skipped splits, so the id
            # space can have gaps the binarizer's column space does not
            self.num_classes = len(self.binarizer.classes_)
        else:
            self.binarizer = None
            self.num_classes = int(max(trl.max(), val.max(), tel.max())) + 1
        if hp.subset_data:
            b = hp.batch_size
            tr, trl = tr[:b], trl[:b]
            va, val = va[:b], val[:b]
            te, tel = te[:b], tel[:b]
        self.subgraphs = {"train": reindex_subgraphs(tr),
                          "val": reindex_subgraphs(va),
                          "test": reindex_subgraphs(te)}
        self.labels = {"train": trl, "val": val, "test": tel}

        emb = load_embeddings(rc.embedding_path(hp.embedding_type))
        self.pretrained_embeds = emb
        self.hp = hp = hp.replace(node_embed_size=int(emb.shape[1]))

        self.cc_ids = {s: initialize_cc_ids(self.graph, self.subgraphs[s])
                       for s in SPLITS}
        self._loaded = True
        return self

    # ------------------------------------------------------------ precompute

    def precompute(self, mesh=None):
        """Border sets, N/P shortest-path sims, S patches/walks/DTW sims —
        all cached under <task>/similarities with reference-compatible
        filenames (reference: SubGNN.py:673-989). With a mesh the two
        device stages (NP-sim CC-min reduction and the DTW pair matrix)
        data-parallelize over every mesh device."""
        assert self._loaded
        import time as _time
        rc, hp = self.rc, self.hp
        sim_dir = rc.similarities_path()
        sim_dir.mkdir(parents=True, exist_ok=True)
        recompute = hp.compute_similarities
        if hp.subset_data:
            # Debug smoke mode truncates the splits (reference
            # SubGNN.py:542-546 truncates at read time), so subgraph-shaped
            # artifacts disagree with the full-data caches in both
            # directions: reading a full-size cache crashes on shape, and
            # writing a subset-size one would poison later full runs.
            # Bypass the cache entirely — compute fresh, touch no files.
            def cached(path, fn, recompute=False):  # noqa: F811 (local)
                return fn()
        else:
            from ..precompute.similarities import cached
        _t0 = _time.time()

        def _stage(name):
            nonlocal _t0
            dt = _time.time() - _t0
            if dt > 5:
                print(f"[precompute] {name}: {dt:.1f}s", flush=True)
            _t0 = _time.time()

        self.border = {s: None for s in SPLITS}
        if hp.use_neighborhood:
            for s in SPLITS:
                self.border[s] = cached(
                    border_set_path(sim_dir, hp.neigh_sample_border_size, s),
                    lambda s=s: compute_border_sets(
                        self.graph, self.cc_ids[s], hp.neigh_sample_border_size),
                    recompute)
        _stage("border sets")

        self.np_sim = {s: None for s in SPLITS}
        if hp.use_neighborhood or hp.use_position:
            # Lazy: only touch the shortest-path matrix when some split's
            # similarity cache actually misses — loading it dominates
            # HPO-trial startup otherwise (it is GBs at EM-USER scale).
            # Above _FULL_SP_MAX_NODES the n^2 all-pairs matrix is never
            # materialized: the CC-min only reads rows AT subgraph-CC nodes
            # (reference SubGNN.py:752-781 indexes only those), so we BFS
            # from just those sources (shortest_path_rows) and remap cc ids
            # into row space. An existing large on-disk matrix is memory-
            # mapped so the host CC-min reads only the rows it needs.
            shortest = None   # (matrix, row_lut-or-None) once computed

            def _shortest():
                nonlocal shortest
                if shortest is None:
                    sp_path = rc.shortest_paths_path()
                    if sp_path.exists():
                        big = sp_path.stat().st_size > 1 << 30
                        mm = "r" if (big and mesh is None) else None
                        shortest = (np.load(sp_path, mmap_mode=mm), None)
                    elif self.graph.n_nodes > _FULL_SP_MAX_NODES:
                        srcs = np.unique(np.concatenate(
                            [self.cc_ids[s].ravel() for s in SPLITS]))
                        srcs = srcs[srcs != PAD_VALUE].astype(np.int64)
                        rows = shortest_path_rows(self.graph, srcs,
                                                  n_threads=hp.n_processes)
                        lut = np.zeros(self.graph.n_nodes + 1, np.int32)
                        lut[srcs] = np.arange(1, len(srcs) + 1, dtype=np.int32)
                        shortest = (rows, lut)
                    else:
                        mat = shortest_path_matrix(self.graph,
                                                   n_threads=hp.n_processes)
                        np.save(rc.shortest_paths_path(), mat)
                        shortest = (mat, None)
                return shortest

            def _np_sim_inputs(s):
                mat, lut = _shortest()
                ids = self.cc_ids[s]
                if lut is not None:
                    ids = lut[ids]  # PAD 0 -> 0; ids now 1-based row space
                return mat, ids

            for s in SPLITS:
                self.np_sim[s] = np.asarray(cached(
                    np_sim_path(sim_dir, s),
                    lambda s=s: compute_shortest_path_similarities(
                        *_np_sim_inputs(s), mesh=mesh),
                    recompute), dtype=np.float32)
        _stage("NP similarities")

        self.int_s_sim = {s: None for s in SPLITS}
        self.bor_s_sim = {s: None for s in SPLITS}
        self.structure_anchors = None
        self.int_walks = self.bor_walks = None
        if hp.use_structure:
            if hp.structure_similarity_fn != "dtw":
                # gated exactly like the reference (SubGNN.py:824-826)
                raise NotImplementedError(hp.structure_similarity_fn)
            self.structure_anchors = cached(
                struc_patches_path(sim_dir, hp),
                lambda: sample_structure_anchor_patches(
                    self.graph, hp, hp.seed, hp.max_sim_epochs),
                recompute).astype(np.int32)
            _stage("structure pool")
            self.int_walks = cached(
                struc_walks_path(sim_dir, hp, True),
                lambda: perform_random_walks(self.graph, hp,
                                             self.structure_anchors, True,
                                             hp.seed),
                recompute).astype(np.int32)
            self.bor_walks = cached(
                struc_walks_path(sim_dir, hp, False),
                lambda: perform_random_walks(self.graph, hp,
                                             self.structure_anchors, False,
                                             hp.seed),
                recompute).astype(np.int32)
            _stage("structure walks")
            for s in SPLITS:
                self.int_s_sim[s] = cached(
                    struc_sim_path(sim_dir, hp, True, s),
                    lambda s=s: compute_structure_similarities(
                        self.graph, self.cc_ids[s], self.structure_anchors,
                        internal=True, mesh=mesh),
                    recompute).astype(np.float32)
                self.bor_s_sim[s] = cached(
                    struc_sim_path(sim_dir, hp, False, s),
                    lambda s=s: compute_structure_similarities(
                        self.graph, self.cc_ids[s], self.structure_anchors,
                        internal=False, mesh=mesh),
                    recompute).astype(np.float32)
            _stage("structure DTW similarities")
        return self

    # --------------------------------------------------------------- anchors

    @staticmethod
    def _subset_split_anchors(split_anchors: Dict[str, Any],
                              idx: np.ndarray) -> Dict[str, Any]:
        """Restrict one split's anchor arrays to subgraph rows `idx` —
        neigh_int/neigh_bor (L, N, C, A) and pos_int (L, N, A) slice their
        subgraph axis; pos_ext/structure arrays are split-wide and shared."""
        out = dict(split_anchors)
        for k in ("neigh_int", "neigh_bor", "pos_int"):
            if k in out:
                out[k] = out[k][:, idx]
        return out

    def sample_anchors(self, seed: Optional[int] = None) -> Dict[str, Dict]:
        """Per-split anchor arrays (reference: SubGNN.py:1047-1061)."""
        hp = self.hp
        seed = hp.seed if seed is None else seed
        anchors: Dict[str, Dict[str, Any]] = {s: {} for s in SPLITS}
        if hp.use_neighborhood:
            for s in SPLITS:
                ai, ab = init_anchors_neighborhood(
                    hp, self.cc_ids[s], self.border[s], seed, SPLIT_TAG[s])
                anchors[s]["neigh_int"] = jnp.asarray(ai)
                anchors[s]["neigh_bor"] = jnp.asarray(ab)
        if hp.use_position:
            pos_ext = jnp.asarray(init_anchors_pos_ext(hp, self.graph, seed))
            for s in SPLITS:
                anchors[s]["pos_int"] = jnp.asarray(init_anchors_pos_int(
                    hp, self.subgraphs[s], seed, SPLIT_TAG[s]))
                anchors[s]["pos_ext"] = pos_ext  # shared (SubGNN.py:1012)
        if hp.use_structure:
            patches, idx, iw, bw = init_anchors_structure(
                hp, self.structure_anchors, self.int_walks, self.bor_walks,
                seed)
            for s in SPLITS:
                anchors[s]["struc_pool_idx"] = jnp.asarray(idx)
                anchors[s]["struc_int_walks"] = jnp.asarray(iw)
                anchors[s]["struc_bor_walks"] = jnp.asarray(bw)
        return anchors

    # ------------------------------------------------------------------ data

    def split_data(self, split: str) -> SubgraphData:
        labels = self.labels[split]
        if self.multilabel:
            labels = self.binarizer.transform(labels)
        else:
            labels = np.asarray(labels, dtype=np.int64)
        from ..data.dataset import pad_node_lists
        return SubgraphData(
            subgraph_ids=pad_node_lists(self.subgraphs[split]),
            cc_ids=self.cc_ids[split],
            labels=labels,
            N_border=self.border[split],
            NP_sim=self.np_sim[split],
            I_S_sim=self.int_s_sim[split],
            B_S_sim=self.bor_s_sim[split],
            multilabel=self.multilabel,
        )

    # ----------------------------------------------------------------- model

    def _cc_tables_from_ids(self, ids: np.ndarray) -> Dict[str, np.ndarray]:
        """Initial per-channel CC tables from the PRETRAINED embeddings
        (reference: SubGNN.py:609-668; val/test stay at this init even as
        node embeddings train — quirk preserved)."""
        table = np.concatenate([np.zeros((1, self.hp.node_embed_size),
                                         np.float32),
                                self.pretrained_embeds], axis=0)
        emb = table[ids]  # (N, C, L, D)
        if self.hp.cc_aggregator == "sum":
            cc = emb.sum(axis=2)
        else:
            cc = emb.max(axis=2)
        return {k: cc.copy() for k in CHANNEL_CC_KEYS}

    def _init_cc_tables(self, split: str) -> Dict[str, np.ndarray]:
        return self._cc_tables_from_ids(self.cc_ids[split])

    def build_model(self, seed: Optional[int] = None):
        hp = self.hp
        seed = hp.seed if seed is None else seed
        model = SubGNNModel(hp, self.graph.n_nodes, self.num_classes,
                            self.multilabel)
        train_cc = self._init_cc_tables("train") if hp.trainable_cc else None
        params, state = model.init_params(jax.random.PRNGKey(seed),
                                          self.pretrained_embeds, train_cc)
        eval_cc = None
        if hp.trainable_cc:
            eval_cc = {s: {k: jnp.asarray(v) for k, v in
                           self._init_cc_tables(s).items()}
                       for s in ("val", "test")}
        return model, params, state, eval_cc

    # ------------------------------------------------------------------- run

    def run(self, seed: Optional[int] = None, log_fn=print,
            restore_path: Optional[str | Path] = None,
            resume_path: Optional[str | Path] = None,
            profile_dir: Optional[str | Path] = None,
            metrics_callback=None) -> Dict[str, Any]:
        """Full train + test cycle; writes the reference's JSON artifacts
        (hyperparams.json, final_metric_scores.json, test_results.json).

        restore_path: filtered weight load, then train max_epochs from
        scratch — the reference's -restoreModelName semantics
        (train.py:264-273). resume_path: elastic restart — restore
        params/opt_state/model state AND the epoch/RNG cursor from a
        checkpoint, then continue to max_epochs reproducing the
        uninterrupted run exactly (TPU-native extension; the reference has
        no mid-run recovery, SURVEY §5)."""
        hp = self.hp
        seed = hp.seed if seed is None else seed
        from ..parallel.mesh import mesh_from_hparams
        mesh = mesh_from_hparams(hp)
        self.load()
        self.precompute(mesh=mesh)
        anchors = self.sample_anchors(seed)
        model, params, state, eval_cc = self.build_model(seed)

        holdout_idx = keep_idx = None
        if self.train_holdout is not None:
            n_train = len(self.subgraphs["train"])
            H = self.train_holdout
            assert len(H) and 0 <= H.min() and H.max() < n_train, \
                (H.min(), H.max(), n_train)
            holdout_idx = H
            keep_idx = np.setdiff1d(np.arange(n_train), H)
            anchors = dict(anchors)
            anchors["holdout"] = self._subset_split_anchors(
                anchors["train"], holdout_idx)
            anchors["train"] = self._subset_split_anchors(
                anchors["train"], keep_idx)
            if hp.trainable_cc:
                # the held-out rows behave like a non-train split: scored
                # with PRETRAINED-initialized CC tables (SubGNN.py:646-668
                # treatment of val/test), while the trainable train table
                # shrinks to the kept rows
                params["train_cc"] = {k: v[keep_idx]
                                      for k, v in params["train_cc"].items()}
                eval_cc = dict(eval_cc)
                eval_cc["holdout"] = {
                    k: jnp.asarray(v[holdout_idx]) for k, v in
                    self._init_cc_tables("train").items()}

        if restore_path:
            payload = load_checkpoint(restore_path)
            params = load_params_filtered(restore_path, params,
                                          payload=payload)
            # the checkpoint's model state (batch-norm running stats) must
            # travel with the weights it was trained with
            if payload.get("state") is not None:
                state = payload["state"]

        ckpt_dir = (self.results_dir / "checkpoints"
                    if self.results_dir and self.checkpoint_k > 0 else None)
        tb_dir = self.results_dir / "tb" if self.results_dir else None
        trainer = Trainer(model, hp, ckpt_dir=ckpt_dir,
                          monitor=self.rc.monitor_metric,
                          checkpoint_k=max(self.checkpoint_k, 1),
                          eval_cc_tables=eval_cc, tb_dir=tb_dir, mesh=mesh)
        if self.results_dir:
            dump_json(self.results_dir / "hyperparams.json", hp.to_dict())
            # trainer_kwargs.json sidecar (train_config.py:179-183 dumps the
            # json-serializable trainer kwargs after popping logger/callback
            # objects). Same keys where they exist, TPU analogs for the rest.
            tkw = {
                "max_epochs": hp.max_epochs,
                "gpus": 0,  # reference key; TPU devices listed below
                "num_sanity_val_steps": 0,
                "progress_bar_refresh_rate":
                    hp.extras.get("progress_bar_refresh_rate", 5),
                "gradient_clip_val": hp.grad_clip,
                "devices": [str(d) for d in (mesh.devices.flatten()
                                             if mesh is not None
                                             else jax.devices())],
                "mesh_axes": (dict(zip(mesh.axis_names, mesh.devices.shape))
                              if mesh is not None else None),
                "monitor": self.rc.monitor_metric,
                "checkpoint_k": self.checkpoint_k,
            }
            if hp.auto_lr_find:
                tkw["auto_lr_find"] = True
            dump_json(self.results_dir / "trainer_kwargs.json", tkw)

        if hp.auto_lr_find and hp.max_epochs > 0:
            found = trainer.lr_find(params, state, self.split_data("train"),
                                    anchors, seed=seed)
            if log_fn:
                log_fn(f"auto_lr_find: {hp.learning_rate:.2e} -> {found:.2e}")
            self.hp = hp = hp.replace(learning_rate=found)
            trainer.hp = hp
            trainer.tx = make_optimizer(hp)  # rebuild with the found lr

        on_epoch_end = None
        if hp.resample_anchor_patches:
            def on_epoch_end(epoch):  # noqa: F811
                fresh = self.sample_anchors(seed + 1000 + epoch)
                if keep_idx is not None:  # keep holdout rows out of fit
                    fresh = dict(fresh)
                    fresh["train"] = self._subset_split_anchors(
                        fresh["train"], keep_idx)
                return fresh

        start_epoch = 0
        if resume_path:
            start_epoch = trainer.resume_from(resume_path)
            if log_fn:
                log_fn(f"resuming from {resume_path} at epoch {start_epoch}")

        train_data = self.split_data("train")
        val_data = self.split_data("val")
        holdout_data = None
        if holdout_idx is not None:
            holdout_data = train_data.subset(holdout_idx)
            train_data = train_data.subset(keep_idx)
        try:
            trainer.fit(params, state, train_data, val_data, anchors,
                        seed=seed, on_epoch_end=on_epoch_end, log_fn=log_fn,
                        start_epoch=start_epoch,
                        profile_dir=(str(profile_dir) if profile_dir
                                     else None),
                        metrics_callback=metrics_callback)
        except Exception:
            # persist whatever was learned before re-raising (pruned trials
            # still dump final_metric_scores like the reference's pruner)
            if self.results_dir and trainer.metric_scores:
                dump_json(self.results_dir / "final_metric_scores.json",
                          dict(trainer.metric_scores[-1]))
            self.trainer = trainer
            raise

        if self.results_dir and trainer.metric_scores:
            dump_json(self.results_dir / "final_metric_scores.json",
                      {k: v for k, v in trainer.metric_scores[-1].items()})

        # test with the best checkpoint (reference: train.py:389-409);
        # restore its model state too, so batch-norm running stats match
        # the restored weights rather than the last epoch's
        if trainer.ckpt and trainer.ckpt.best_path:
            payload = load_checkpoint(trainer.ckpt.best_path)
            trainer.params = load_params_filtered(trainer.ckpt.best_path,
                                                  trainer.params,
                                                  payload=payload)
            if payload.get("state") is not None:
                trainer.state = jax.tree_util.tree_map(
                    jnp.asarray, payload["state"])
        test_metrics = trainer.evaluate(self.split_data("test"),
                                        anchors["test"], "test")
        holdout_metrics = None
        if holdout_data is not None:
            # scored with the SAME restored best-val checkpoint as test —
            # an unbiased estimate of the protocol quantity from train data
            holdout_metrics = trainer.evaluate(holdout_data,
                                               anchors["holdout"], "holdout")
        if self.results_dir:
            dump_json(self.results_dir / "test_results.json", test_metrics)
        self.trainer = trainer
        return {"val": trainer.metric_scores[-1] if trainer.metric_scores else {},
                "test": test_metrics,
                "holdout": holdout_metrics,
                "best_monitor": trainer.best_monitor_value()}


    # --------------------------------------------------------------- serving

    def predict(self, node_lists, params=None, state=None,
                seed: Optional[int] = None,
                anchors: Optional[Dict[str, Any]] = None,
                max_n_cc: Optional[int] = None,
                max_len_cc: Optional[int] = None):
        """Classify NEW subgraphs of the loaded base graph (serving path —
        a capability the reference lacks: its eval only covers the
        pre-split dataset, SubGNN/test.py).

        node_lists: list of 1-based node-id lists over the SAME base graph
        as the training data. Requires load() + precompute() (for the
        persisted structure anchor pool/walks) and trained parameters
        (run() first, or pass params/state restored from a checkpoint).

        Per-subgraph precompute runs on the fly, never touching the n^2
        shortest-path matrix: CC split, border sets, NP sims from
        source-subset BFS rows (shortest_path_rows), and DTW against the
        SAME persisted anchor pool the model trained with. With
        trainable_cc the unseen subgraphs' CC tables are initialized from
        the pretrained embeddings — exactly the reference's treatment of
        non-train splits (SubGNN.py:646-668).

        Returns {"logits": (N, num_classes) float32,
                 "probs":  sigmoid (multilabel) or softmax probabilities,
                 "pred":   thresholded labels / argmax class ids,
                 "timings": per-stage wall-clock seconds}.

        Warm-path latency structure (round 4, VERDICT r3 task 3): the
        request BFS runs on C++ threads CONCURRENTLY with the structure
        DTW (one fused internal+border device dispatch) and anchor
        sampling; the anchor pool's degree sequences and the
        request-invariant pos_ext/structure anchors are cached on the
        pipeline after the first call.
        """
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        hp = self.hp
        assert self._loaded, "call load() + precompute() first"
        trainer = getattr(self, "trainer", None)
        if params is None:
            assert trainer is not None, "run() first or pass params/state"
            params, state = trainer.params, trainer.state
        if state is None:
            # state only carries batch-norm running stats; a silent {} would
            # KeyError inside the jitted forward for batch_norm configs
            assert not hp.batch_norm, (
                "hp.batch_norm models carry running stats: pass the "
                "checkpoint's `state` alongside `params`")
            state = {}
        seed = hp.seed if seed is None else seed
        PREDICT_TAG = 3  # fresh RNG stream, disjoint from SPLIT_TAG
        timings: Dict[str, float] = {}
        t_all = _time.time()

        # max_n_cc/max_len_cc pin the padded CC shape: the jitted forward
        # retraces (a multi-minute remote compile over the axon tunnel) on
        # every NEW (C, L), which is data-dependent — a steady serving
        # deployment should pass fixed bounds
        t0 = _time.time()
        cc_ids = initialize_cc_ids(self.graph, node_lists,
                                   max_n_cc=max_n_cc,
                                   max_len_cc=max_len_cc)         # (N, C, L)
        timings["cc_split"] = _time.time() - t0
        n = len(node_lists)

        def _bfs_rows():
            # the C++ BFS releases the GIL (ctypes foreign call), so this
            # runs truly in parallel with the host-side DTW prep below.
            # Rows are LRU-cached by source node across requests: steady
            # serving repeats/overlaps subgraphs, and a warm node's row
            # costs 0 instead of the measured ~4.3 ms/source C++ BFS
            # (PERF.md round-5 serving section; the device-BFS alternative
            # is rejected there with stream arithmetic)
            srcs = np.unique(cc_ids.ravel())
            srcs = srcs[srcs != PAD_VALUE].astype(np.int64)
            # one lock around lookup+BFS+insert: concurrent predict()
            # callers share the cache AND the C++ BFS thread pool, so
            # serializing here is both the simple-correct choice (no
            # eviction race between a lookup and its use) and roughly
            # what the host could do anyway
            lock = getattr(self, "_bfs_cache_lock", None)
            if lock is None:
                lock = self._bfs_cache_lock = _threading.Lock()
            with lock:
                cache = getattr(self, "_bfs_row_cache", None)
                if cache is None:
                    cache = self._bfs_row_cache = _OrderedDict()
                missing = np.array([s for s in srcs if int(s) not in cache],
                                   dtype=np.int64)
                if missing.size:
                    new_rows = shortest_path_rows(self.graph, missing,
                                                  n_threads=hp.n_processes)
                    for s, row in zip(missing, new_rows):
                        # copy: caching a VIEW would pin the whole
                        # (missing, n_nodes) batch array for as long as
                        # any one row stays hot, breaking the cache cap
                        cache[int(s)] = row.copy()
                timings["bfs_srcs"] = int(srcs.size)
                timings["bfs_cache_miss"] = int(missing.size)
                rows = np.stack([cache[int(s)] for s in srcs])
                for s in srcs:  # mark this request's rows MRU
                    cache.move_to_end(int(s))
                # ~229 KB/row at 57k nodes; 2048 rows cap ~= 470 MB
                while len(cache) > self.BFS_ROW_CACHE_SIZE:
                    cache.popitem(last=False)
            # np_sim + border derive from the rows HERE, still on the
            # worker thread, so they overlap the DTW prep below too
            t0 = _time.time()
            lut = np.zeros(self.graph.n_nodes + 1, np.int32)
            lut[srcs] = np.arange(1, len(srcs) + 1, dtype=np.int32)
            np_sim_ = compute_shortest_path_similarities(rows, lut[cc_ids])
            timings["np_sim"] = _time.time() - t0
            border_ = None
            if hp.use_neighborhood:
                t0 = _time.time()
                border_ = border_sets_from_rows(
                    srcs, rows, cc_ids, hp.neigh_sample_border_size,
                    self.graph.n_nodes)
                timings["border_sets"] = _time.time() - t0
            return np_sim_, border_


        np_sim = None
        pool = ThreadPoolExecutor(max_workers=1)
        border = None
        bfs_future = None
        try:
            if hp.use_neighborhood or hp.use_position:
                t_bfs = _time.time()
                bfs_future = pool.submit(_bfs_rows)

            int_s = bor_s = None
            if hp.use_structure:
                assert self.structure_anchors is not None, "precompute() first"
                t0 = _time.time()
                if not hasattr(self, "_serving_anchor_seqs"):
                    self._serving_anchor_seqs = {}
                int_s, bor_s = structure_similarities_both(
                    self.graph, cc_ids, self.structure_anchors,
                    anchor_cache=self._serving_anchor_seqs)
                timings["structure_sims"] = _time.time() - t0

            if bfs_future is not None:
                np_sim, border = bfs_future.result()
                timings["bfs_rows_wall"] = _time.time() - t_bfs

            if anchors is None:
                t0 = _time.time()
                anchors = {}
                if hp.use_neighborhood:
                    ai, ab = init_anchors_neighborhood(hp, cc_ids, border,
                                                       seed, PREDICT_TAG)
                    anchors["neigh_int"] = jnp.asarray(ai)
                    anchors["neigh_bor"] = jnp.asarray(ab)
                if hp.use_position:
                    anchors["pos_int"] = jnp.asarray(init_anchors_pos_int(
                        hp, node_lists, seed, PREDICT_TAG))
                    # shared across splits — identical to the training-time
                    # set (same seed-derived stream, reference
                    # SubGNN.py:1012); request-invariant, cached per seed
                    cache = getattr(self, "_serving_anchor_cache", None)
                    if cache is None or cache[0] != seed:
                        cache = (seed, {"pos_ext": jnp.asarray(
                            init_anchors_pos_ext(hp, self.graph, seed))})
                        self._serving_anchor_cache = cache
                    anchors["pos_ext"] = cache[1]["pos_ext"]
                if hp.use_structure:
                    cache = getattr(self, "_serving_anchor_cache",
                                    (seed, {}))
                    if cache[0] != seed:
                        cache = (seed, {})
                    if "struc" not in cache[1]:
                        _, idxp, iw, bw = init_anchors_structure(
                            hp, self.structure_anchors, self.int_walks,
                            self.bor_walks, seed)
                        cache[1]["struc"] = (jnp.asarray(idxp),
                                             jnp.asarray(iw),
                                             jnp.asarray(bw))
                        self._serving_anchor_cache = cache
                    (anchors["struc_pool_idx"], anchors["struc_int_walks"],
                     anchors["struc_bor_walks"]) = cache[1]["struc"]
                timings["anchors"] = _time.time() - t0
        finally:
            pool.shutdown(wait=True)

        cc_tables = None
        if hp.trainable_cc:
            t0 = _time.time()
            cc_tables = {k: jnp.asarray(v) for k, v in
                         self._cc_tables_from_ids(cc_ids).items()}
            timings["cc_tables"] = _time.time() - t0

        from ..data.dataset import pad_node_lists
        labels = (np.zeros((n, self.num_classes), np.float32)
                  if self.multilabel else np.zeros(n, np.int64))
        data = SubgraphData(
            subgraph_ids=pad_node_lists(node_lists), cc_ids=cc_ids,
            labels=labels, N_border=border, NP_sim=np_sim,
            I_S_sim=int_s, B_S_sim=bor_s, multilabel=self.multilabel)

        # One jitted forward per PIPELINE (not per call): a fresh closure
        # every predict() would recompile on every serving request (a full
        # remote compile over the axon tunnel). anchors/cc_tables travel as
        # jit ARGUMENTS, never closure constants (closed-over device arrays
        # embed in the serialized HLO and overflow the axon remote-compile
        # limit at scale — CLAUDE.md).
        if not hasattr(self, "_predict_fwd"):
            model = SubGNNModel(hp, self.graph.n_nodes, self.num_classes,
                                self.multilabel)

            @jax.jit
            def _fwd(params, state, batch, anchors, cc_tables):
                logits, _ = model.forward(params, state, batch, anchors,
                                          train=False, rng=None,
                                          cc_tables=cc_tables)
                return logits

            self._predict_fwd = _fwd
        fwd = self._predict_fwd

        out = []
        B = hp.batch_size
        arange_b = jnp.arange(B, dtype=jnp.int32)
        t_fwd = _time.time()
        # COMPACT anchor-column sims (train/sims.py), same as the fused
        # trainer: ship (L, B, C, A) gathered columns instead of the full
        # (B, C, n_nodes) tensor — at 57k nodes that tensor is tens of MB
        # of per-request host->device transfer over the axon tunnel and
        # was 80% of the measured warm latency (PERF.md serving v2)
        from .sims import compact_sims_for_batch
        for batch in data.batches(B, shuffle=False, drop_last=False,
                                  include_np_sim=False):
            valid = batch["valid"]
            idx = batch["subgraph_idx"]
            # forward() never reads subgraph_ids, and its pad width follows
            # the request's LONGEST node list — keeping it out of the jit
            # arguments avoids both a retrace (remote compile) per new
            # length and a per-batch host->device transfer
            jbatch = {k: (jnp.asarray(v) if v is not None else None)
                      for k, v in batch.items() if k != "subgraph_ids"}
            if np_sim is not None:
                comp = compact_sims_for_batch(np_sim, anchors, hp, idx)
                jbatch.update({k: jnp.asarray(v) for k, v in comp.items()})
            # slice the request-sized (N-dim) arrays down to this batch and
            # re-index within it: every jit argument is then (B, ...) no
            # matter how many subgraphs the request carried, so a steady
            # serving deployment never retraces on request COUNT (each
            # retrace is a multi-minute remote compile over the axon tunnel)
            banchors = dict(anchors)
            for k in ("neigh_int", "neigh_bor", "pos_int"):
                if k in banchors:
                    banchors[k] = banchors[k][:, idx]
            bcc_tables = cc_tables
            if cc_tables is not None:
                bcc_tables = {k: v[idx] for k, v in cc_tables.items()}
            jbatch["subgraph_idx"] = arange_b
            out.append(np.asarray(
                fwd(params, state, jbatch, banchors, bcc_tables))[valid])
        timings["forward"] = _time.time() - t_fwd
        timings["total"] = _time.time() - t_all
        logits = np.concatenate(out).astype(np.float32)
        if self.multilabel:
            probs = 1.0 / (1.0 + np.exp(-logits))
            pred = (probs > 0.5).astype(np.int32)
        else:
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            probs = e / e.sum(axis=1, keepdims=True)
            pred = probs.argmax(axis=1).astype(np.int32)
        return {"logits": logits, "probs": probs, "pred": pred,
                "timings": timings}


def load_best_hyperparams(path: str | Path) -> HParams:
    """Load a frozen best_model_hyperparameters/*/hyperparams.json dict."""
    with open(path) as f:
        return HParams.from_dict(json.load(f))
