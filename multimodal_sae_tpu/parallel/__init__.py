from .mesh import (
    get_mesh,
    data_sharding,
    replicated_sharding,
    module_sharding,
    local_shard_bounds,
    shard_dataset_contiguous,
)
from .distributed import initialize_distributed, process_count, process_index

__all__ = [
    "get_mesh",
    "data_sharding",
    "replicated_sharding",
    "module_sharding",
    "local_shard_bounds",
    "shard_dataset_contiguous",
    "initialize_distributed",
    "process_count",
    "process_index",
]
