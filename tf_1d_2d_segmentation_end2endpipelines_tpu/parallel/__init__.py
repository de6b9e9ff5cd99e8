"""Device-mesh + sharding helpers."""

from .mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_shardings,
    local_mesh,
    make_mesh,
    make_multislice_mesh,
    replicated,
    shard_batch,
)
from .sharding_rules import param_shardings, state_shardings  # noqa: F401
from .spatial import (  # noqa: F401
    length_sharded_batches,
    signal_windows,
    sharded_patch_inference,
    sharded_window_inference,
)
