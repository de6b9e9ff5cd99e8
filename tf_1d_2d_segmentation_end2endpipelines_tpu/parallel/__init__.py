"""Device-mesh + sharding helpers."""

from .distributed import (  # noqa: F401
    DistributedLoader,
    global_batch,
    process_shard_indices,
    shard_dataset_for_process,
)
from .mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_shardings,
    local_mesh,
    make_mesh,
    make_multislice_mesh,
    replicated,
    shard_batch,
)
from .pipeline import (  # noqa: F401
    make_pipeline_mesh,
    pipeline_apply,
    stack_stage_params,
    unstack_stage_params,
)
from .sharding_rules import (  # noqa: F401
    param_shardings,
    state_shardings,
    zero1_state_shardings,
)
from .spatial import (  # noqa: F401
    length_sharded_batches,
    signal_windows,
    sharded_patch_inference,
    sharded_window_inference,
)
