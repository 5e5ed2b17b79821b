"""Multi-chip scale-out — the TPU-native replacement for the reference's
multi-node story (SURVEY.md §2.4.6: WAL streaming replicas + Citus/PgDog
sharding, README.md:758-760).

Vectors/postings shard across a ``jax.sharding.Mesh``; queries replicate
via ICI all-gather; each shard computes a partial top-k and the results
merge with a cross-shard reduction — the library analogue of "shard the
table with Citus, run the same index on every shard, merge the ORDER BY".
"""

from .mesh import make_mesh, shard_rows
from .sharded import (
    sharded_exact_search,
    sharded_kmeans_step,
    train_centers_sharded,
    DeviceShardedHNSWIndex,
    DeviceShardedIVFFlatIndex,
    ShardedFlatIndex,
    ShardedHNSWIndex,
    ShardedIVFFlatIndex,
)

__all__ = [
    "make_mesh",
    "shard_rows",
    "sharded_exact_search",
    "sharded_kmeans_step",
    "train_centers_sharded",
    "DeviceShardedHNSWIndex",
    "DeviceShardedIVFFlatIndex",
    "ShardedFlatIndex",
    "ShardedHNSWIndex",
    "ShardedIVFFlatIndex",
]
