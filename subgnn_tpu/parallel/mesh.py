"""Device mesh + sharding specs for multi-chip SubGNN training.

The reference is single-GPU with no distributed code
(reference: SubGNN/train_config.py:122 hard-codes gpus=1); this layer is
green-field TPU design:

  axes:
    'data' — batch data parallelism over subgraphs (subgraphs are fully
             independent; gradients psum across 'data'),
    'node' — shards the n_nodes axis of the big tensors: the node embedding
             table (rows) and the N/P shortest-path similarity tensor
             (its last axis). The per-batch anchor gathers then induce XLA
             all-to-all / all-gather collectives over ICI instead of
             materializing the full (B, C, n_nodes) slice per device.

Everything else (MPN weights, LSTM, head, anchors) is replicated — model
weights are tiny relative to the similarity tensors, so DP + node-sharding
is the right decomposition for this architecture (its FLOPs scale with
batch x anchors, its memory with n_nodes).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(n_data: Optional[int] = None, n_node: int = 1,
                     devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_node
    need = n_data * n_node
    assert need <= len(devices), (n_data, n_node, len(devices))
    arr = np.asarray(devices[:need]).reshape(n_data, n_node)
    return Mesh(arr, ("data", "node"))


def mesh_from_hparams(hp, devices=None) -> Optional[Mesh]:
    """Build the training mesh the HParams ask for (mesh_data_axis x
    mesh_node_axis), or None for the single-device path. This is how the
    production Trainer goes multi-chip — set the two knobs in the run
    config / hyperparams.json and everything else follows."""
    n_data = int(getattr(hp, "mesh_data_axis", 1) or 1)
    n_node = int(getattr(hp, "mesh_node_axis", 1) or 1)
    if n_data * n_node <= 1:
        return None
    avail = len(devices if devices is not None else jax.devices())
    if n_data * n_node > avail:
        raise ValueError(
            f"mesh_data_axis*mesh_node_axis = {n_data}*{n_node} exceeds the "
            f"{avail} visible devices")
    return make_device_mesh(n_data=n_data, n_node=n_node, devices=devices)


# batch keys that are NOT batch-major: compact anchor-column similarity
# tensors (train/sims.py) are layer-major (L, B, C, A)
_COMPACT_SIM_KEYS = ("neigh_sims", "pos_in_sims", "pos_out_sims")


def _replicate_like(tree):
    """A pspec pytree of P() with the same structure as `tree` (GatherPlans
    and other registered pytrees keep their treedef, incl. aux data)."""
    return jax.tree_util.tree_map(lambda _: P(), tree)


def batch_pspecs(batch: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs for one batch dict: leading axis over 'data'; the
    NP similarity tensor additionally shards its node axis over 'node';
    compact anchor-column sims (layer-major) shard their B axis; gather
    plans (host-built tile routing, train/plans.py) replicate."""
    specs: Dict[str, Any] = {}
    for k, v in batch.items():
        if v is None:
            specs[k] = None
        elif k == "NP_sim":
            specs[k] = P("data", None, "node")
        elif k in _COMPACT_SIM_KEYS:
            specs[k] = P(None, "data")
        elif k.endswith("_plan"):
            specs[k] = _replicate_like(v)
        else:
            specs[k] = P("data")
    return specs


def split_pspecs(split_arrays: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs for a device-resident WHOLE split (fused-epoch mode):
    everything replicated except the (n_sub, C, n_nodes) NP similarity
    tensor, whose node axis shards over 'node' (it is the memory wall)."""
    specs: Dict[str, Any] = {}
    for k, v in split_arrays.items():
        if v is None:
            specs[k] = None
        elif k == "NP_sim":
            specs[k] = P(None, None, "node")
        else:
            specs[k] = P()
    return specs


def epoch_extras_pspecs(extras: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs for per-epoch stacked extras fed to the fused
    lax.scan: compact sims are (n_batches, L, B, C, A) -> shard B over
    'data'; stacked GatherPlans replicate (their tile routing indexes the
    whole batch's flat gradient rows)."""
    specs: Dict[str, Any] = {}
    for k, v in extras.items():
        if k in _COMPACT_SIM_KEYS:
            specs[k] = P(None, None, "data")
        else:
            specs[k] = _replicate_like(v)
    return specs


def anchor_pspecs(anchors: Dict[str, Any]) -> Dict[str, Any]:
    """Anchors are replicated (they are small index arrays)."""
    return {k: P() for k in anchors}


def param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """node_embed rows shard over 'node'; everything else replicated."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if keys and keys[0] == "node_embed":
            return P("node", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_tree(mesh: Mesh, tree, pspecs):
    """device_put a pytree with the given PartitionSpecs (None leaves pass
    through)."""

    def put(leaf, spec):
        if leaf is None:
            return None
        return jax.device_put(leaf, NamedSharding(mesh, spec if spec is not None else P()))

    return jax.tree_util.tree_map(put, tree, pspecs,
                                  is_leaf=lambda x: x is None)
