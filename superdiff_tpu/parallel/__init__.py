from . import distributed
from .mesh import (
    make_mesh,
    data_sharding,
    replicated,
    ensemble_sharding,
    shard_batch,
    local_mesh_for_testing,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "ensemble_sharding",
    "shard_batch",
    "local_mesh_for_testing",
]
