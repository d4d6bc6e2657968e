from .shortest_paths import shortest_path_matrix
from .border import compute_border_sets
from .degree import degree_sequences
from .dtw import dtw_distance_batch, dtw_similarity_matrix, dtw_host
from .similarities import (
    compute_shortest_path_similarities,
    compute_structure_similarities,
)

__all__ = [
    "shortest_path_matrix",
    "compute_border_sets",
    "degree_sequences",
    "dtw_distance_batch",
    "dtw_similarity_matrix",
    "dtw_host",
    "compute_shortest_path_similarities",
    "compute_structure_similarities",
]
