from .walks import triangular_random_walk, perform_random_walks, sample_structure_anchor_patches
from .anchors import (
    init_anchors_neighborhood,
    init_anchors_pos_int,
    init_anchors_pos_ext,
    init_anchors_structure,
    AnchorState,
)

__all__ = [
    "triangular_random_walk",
    "perform_random_walks",
    "sample_structure_anchor_patches",
    "init_anchors_neighborhood",
    "init_anchors_pos_int",
    "init_anchors_pos_ext",
    "init_anchors_structure",
    "AnchorState",
]
