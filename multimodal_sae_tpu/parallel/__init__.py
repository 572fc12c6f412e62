from .mesh import (
    get_mesh,
    data_sharding,
    replicated_sharding,
    module_sharding,
    local_shard_bounds,
    shard_dataset_contiguous,
)
from .distributed import initialize_distributed, process_count, process_index
from .collectives import all_gather_objects, barrier, gather_objects
from .tensor_parallel import (
    llama_param_specs,
    replicate_on_mesh,
    replicate_saes,
    shard_llama_params,
    shard_subject_model,
)
from .data_parallel import place_rows, place_rows_padded, shard_subject_model_dp

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
    "all_gather_objects",
    "barrier",
    "gather_objects",
    "llama_param_specs",
    "replicate_on_mesh",
    "replicate_saes",
    "shard_llama_params",
    "shard_subject_model",
    "place_rows",
    "place_rows_padded",
    "shard_subject_model_dp",
]
