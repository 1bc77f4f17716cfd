from .mesh import (
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
    "init_distributed",
    "is_default_process",
]
