"""subgnn_tpu — a TPU-native subgraph neural network framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of SubGNN
(NeurIPS 2020, "Subgraph Neural Networks", mims-harvard/SubGNN): learning
embeddings for subgraphs of a large base graph via three parallel property
channels (Neighborhood / Structure / Position), each split into internal and
border sub-channels, with anchor-patch message passing weighted by
channel-specific precomputed similarities.

Design stance (vs. the reference implementation):
  * arrays, not objects: the base graph is CSR (indptr/indices) with 1-based
    node ids so 0 is the padding id everywhere; subgraphs are padded
    (n_subgraphs, max_n_cc, max_len_cc) int32 tensors.
  * the per-layer anchor-patch -> connected-component message passing
    collapses to dense masked einsums (the bipartite edge structure is
    regular), executed on the MXU; no sparse scatter in the hot loop.
  * sampling uses stateless jax.random keys (host-count invariant).
  * precompute (BFS shortest paths, DTW structure similarities, border sets,
    triangular random walks) is a separate, cached, artifact-producing stage.
  * training is a jit-compiled step function over a jax.sharding.Mesh
    (data-parallel over subgraphs, optionally node-sharded similarity
    tensors), with optax optimizers.
"""

PAD_VALUE = 0  # node id 0 is reserved for padding (reference: config.py:9)

__version__ = "0.1.0"

from . import config  # noqa: E402,F401
from .config import HParams, RunConfig  # noqa: E402,F401


def __getattr__(name):
    # lazy: importing the pipeline pulls in jax; keep bare
    # `import subgnn_tpu` cheap for config-only consumers
    if name == "SubGNNPipeline":
        from .train.runner import SubGNNPipeline
        return SubGNNPipeline
    if name == "Trainer":
        from .train.loop import Trainer
        return Trainer
    raise AttributeError(name)
