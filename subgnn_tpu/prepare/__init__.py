from .synthetic import SyntheticGraphBuilder, generate_mask, write_subgraph_tsv
from .node_emb import train_node_embeddings

__all__ = [
    "SyntheticGraphBuilder",
    "generate_mask",
    "write_subgraph_tsv",
    "train_node_embeddings",
]
