from .mesh import (
    reduce_dict_mean,
    make_mesh,
    param_partition_spec,
    shard_params,
    shard_batch,
    replicate,
    host_allgather,
    init_distributed,
    is_default_process,
)

__all__ = [
    "make_mesh",
    "param_partition_spec",
    "shard_params",
    "shard_batch",
    "replicate",
    "host_allgather",
    "reduce_dict_mean",
    "init_distributed",
    "is_default_process",
]
