from .mesh import (
    get_mesh,
    data_sharding,
    replicated_sharding,
    module_sharding,
    local_shard_bounds,
    shard_dataset_contiguous,
)
from .distributed import initialize_distributed, process_count, process_index
from .tensor_parallel import llama_param_specs, shard_llama_params

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
    "llama_param_specs",
    "shard_llama_params",
]
