from .mesh import (
    make_device_mesh,
    batch_pspecs,
    param_pspecs,
    anchor_pspecs,
    shard_tree,
)

__all__ = [
    "make_device_mesh",
    "batch_pspecs",
    "param_pspecs",
    "anchor_pspecs",
    "shard_tree",
]
