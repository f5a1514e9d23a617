"""Multi-chip sharding and fused protocol steps (SURVEY §2 parallelism map)."""

from .step import (
    batch_sharding,
    beaver_mul_step,
    flagship_forward,
    mac_check_fold,
    make_mesh,
    replicate,
    shard_share,
    sharded_mul_mac_step,
)

__all__ = [
    "batch_sharding",
    "beaver_mul_step",
    "flagship_forward",
    "mac_check_fold",
    "make_mesh",
    "replicate",
    "shard_share",
    "sharded_mul_mac_step",
]
