from .mesh import (
    make_mesh,
    make_sharded_trainer,
    param_sharding_rules,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "make_sharded_trainer",
    "param_sharding_rules",
    "shard_batch",
    "shard_params",
]
