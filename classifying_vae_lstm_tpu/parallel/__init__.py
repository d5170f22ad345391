from .shard_map_step import make_shard_map_train_step, replicate
from .mesh import (
    make_mesh,
    shard_training_state,
    param_sharding_rules,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "shard_training_state",
    "param_sharding_rules",
    "shard_batch",
    "shard_params",
    "make_shard_map_train_step",
    "replicate",
]
