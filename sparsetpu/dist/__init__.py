"""Distributed (mesh-sharded) SpMV: all-gather and ring-overlap schedules."""

from .ring import RingShardedSpmv, ring_shard_spmv
from .spmv_dist import ShardedSpmv, make_mesh, shard_spmv

__all__ = ["ShardedSpmv", "RingShardedSpmv", "make_mesh", "shard_spmv",
           "ring_shard_spmv"]
