"""Device mesh construction and sharding helpers."""

from .mesh import (
    data_sharding,
    make_mesh,
    replicated,
    setup_distributed,
    shard_epoch_arrays,
)

__all__ = [
    "make_mesh",
    "replicated",
    "data_sharding",
    "shard_epoch_arrays",
    "setup_distributed",
]
