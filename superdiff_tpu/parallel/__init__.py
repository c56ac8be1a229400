from . import distributed
from .mesh import (
    make_mesh,
    data_sharding,
    replicated,
    ensemble_sharding,
    shard_batch,
    local_mesh_for_testing,
)
from .tp import (make_ensemble_tp_mesh, make_tp_mesh, place_tp,
                 sd_tp_shardings, sd_tp_shardings_stacked)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "ensemble_sharding",
    "shard_batch",
    "local_mesh_for_testing",
    "make_ensemble_tp_mesh",
    "make_tp_mesh",
    "place_tp",
    "sd_tp_shardings",
    "sd_tp_shardings_stacked",
]
