"""Device-mesh parallelism utilities."""

from .mesh import (
    make_mesh,
    replicate_tree,
    shard_batch,
    unreplicate,
)

__all__ = ["make_mesh", "replicate_tree", "shard_batch", "unreplicate"]
