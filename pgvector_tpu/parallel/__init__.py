"""Multi-chip scale-out — the TPU-native replacement for the reference's
multi-node story (SURVEY.md §2.4.6: WAL streaming replicas + Citus/PgDog
sharding, README.md:758-760).

Vectors/postings shard across a ``jax.sharding.Mesh``; queries replicate
via ICI all-gather; each shard computes a partial top-k and the results
merge with a cross-shard reduction — the library analogue of "shard the
table with Citus, run the same index on every shard, merge the ORDER BY".

For read throughput, a 2-D ``(shard × qp)`` mesh (``make_mesh2``) adds
query fan-out: the index replicates over the ``qp`` axis and each replica
column answers its slice of the batch — the analogue of scaling reads by
adding backends/streaming replicas (test/t/001, test/t/016).
"""

from .mesh import make_mesh, make_mesh2, shard_rows
from .sharded import (
    dim_sharded_exact_search,
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
    "make_mesh2",
    "shard_rows",
    "dim_sharded_exact_search",
    "sharded_exact_search",
    "sharded_kmeans_step",
    "train_centers_sharded",
    "DeviceShardedHNSWIndex",
    "DeviceShardedIVFFlatIndex",
    "ShardedFlatIndex",
    "ShardedHNSWIndex",
    "ShardedIVFFlatIndex",
]
