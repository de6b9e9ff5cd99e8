"""Device-mesh + sharding helpers."""

from .mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_shardings,
    local_mesh,
    make_mesh,
    replicated,
    shard_batch,
)
