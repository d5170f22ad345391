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
]
