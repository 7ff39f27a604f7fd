"""Multi-chip scaling: mesh construction and sharding rules."""

from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    distributed_init,
)
