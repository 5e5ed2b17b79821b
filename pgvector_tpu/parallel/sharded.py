"""Sharded search primitives and index wrappers.

Design (SURVEY.md §2.4.6, §7 M5): the vector store shards by row range over
a 1-D mesh; the query batch is replicated; each shard computes a partial
top-k over its rows with *global* row ids; the per-shard candidate sets are
all-gathered over ICI and reduced to the final top-k.  All collectives are
inserted by XLA from the shard_map specs — no explicit NCCL/MPI analogue.

For the index AMs the sharding story mirrors the reference's production
deployment (pgvector sharded via Citus, README.md:758-760): every shard
holds an independent per-shard index (IVF posting lists or an HNSW graph)
over its row range; a query fans out to all shards and merges the per-shard
ORDER BY streams.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import distance as D
from ..ops.metric import Metric
from ..ops.topk import topk_smallest

# ---------------------------------------------------------------------------
# sharded exact search — per-shard partial top-k + ICI merge
# ---------------------------------------------------------------------------


def sharded_exact_search(
    mesh: Mesh,
    metric: Metric,
    db: jnp.ndarray,  # (N, D) — will be sharded over rows
    qs: jnp.ndarray,  # (Q, D) — replicated
    k: int,
    valid: Optional[jnp.ndarray] = None,
    axis: str = "shard",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a row-sharded database.

    Each shard scores its rows (one MXU matmul), keeps a local top-k with
    global ids, then the (n_shards · k) candidates are all-gathered over ICI
    and reduced.  This is pgvector's parallel seq scan + Gather
    (SURVEY.md §2.4.4) mapped onto the mesh.
    """
    n = db.shape[0]
    n_shards = mesh.shape[axis]
    pad = (-n) % n_shards
    if pad:
        db = jnp.pad(db, ((0, pad), (0, 0)))
    if valid is None:
        valid = jnp.arange(n + pad) < n
    else:
        valid = jnp.pad(valid[:n], (0, pad))

    def shard_fn(db_s, valid_s, qs_rep):
        # local ids -> global ids via the shard index
        shard_i = jax.lax.axis_index(axis)
        rows_per = db_s.shape[0]
        scores = D.dense_scores(metric, qs_rep, db_s)
        scores = jnp.where(valid_s[None, :], scores, jnp.inf)
        local_d, local_i = topk_smallest(scores, min(k, rows_per))
        global_i = local_i + shard_i * rows_per
        global_i = jnp.where(jnp.isinf(local_d), -1, global_i)
        # gather all shards' candidates and reduce
        all_d = jax.lax.all_gather(local_d, axis, axis=0)  # (S, Q, k)
        all_i = jax.lax.all_gather(global_i, axis, axis=0)
        qn = qs_rep.shape[0]
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(qn, -1)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(qn, -1)
        d, i = topk_smallest(all_d, k, ids=all_i)
        i = jnp.where(jnp.isinf(d), -1, i)
        return d, i

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,  # outputs are replicated via the all_gather merge
    )
    return fn(db, valid, qs)


# ---------------------------------------------------------------------------
# sharded k-means step — data parallel over samples, psum of center sums
# ---------------------------------------------------------------------------


def sharded_kmeans_step(
    mesh: Mesh,
    data: jnp.ndarray,  # (S, D) sharded over samples
    centers: jnp.ndarray,  # (k, D) replicated
    axis: str = "shard",
) -> jnp.ndarray:
    """One Lloyd's iteration over a sample-sharded dataset: local assignment
    matmul + local per-center partial sums, reduced with psum over ICI —
    the data-parallel analogue of the reference's parallel build workers
    feeding one shared state (SURVEY.md §2.4.2-3)."""
    s = data.shape[0]
    n_shards = mesh.shape[axis]
    pad = (-s) % n_shards
    k = centers.shape[0]
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
    weights = jnp.concatenate([jnp.ones(s), jnp.zeros(pad)])

    def shard_fn(data_s, w_s, centers_rep):
        ip = jax.lax.dot_general(
            data_s, centers_rep,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        c_sq = jnp.sum(centers_rep * centers_rep, axis=1)
        assign = jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=1)
        sums = jax.ops.segment_sum(data_s * w_s[:, None], assign, num_segments=k)
        counts = jax.ops.segment_sum(w_s, assign, num_segments=k)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts == 0)[:, None], centers_rep, new_centers)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,  # psum makes the outputs replicated
    )
    return fn(data, weights, centers)


# ---------------------------------------------------------------------------
# sharded index wrappers — one sub-index per shard, fan-out + merge
# ---------------------------------------------------------------------------


class _ShardedWrapper:
    """Shared fan-out/merge logic: rows are split into contiguous ranges,
    one per shard; each range gets its own single-chip index; queries run
    against every shard and the per-shard (d, global_id) streams merge."""

    def __init__(self, n_shards: int):
        self.n_shards = n_shards
        self.shards = []
        self.offsets = []

    def _merge(self, results, k: int):
        ds = np.concatenate([d for d, _ in results], axis=1)
        is_ = np.concatenate(
            [np.where(i >= 0, i + off, -1) for (_, i), off in zip(results, self.offsets)],
            axis=1,
        )
        order = np.argsort(ds, axis=1)[:, :k]
        return np.take_along_axis(ds, order, axis=1), np.take_along_axis(is_, order, axis=1)


class ShardedFlatIndex(_ShardedWrapper):
    """Row-sharded exact search over a mesh (device-resident shards)."""

    def __init__(self, mesh: Mesh, table, metric: Metric, axis: str = "shard"):
        super().__init__(mesh.shape[axis])
        self.mesh = mesh
        self.axis = axis
        self.table = table
        self.metric = metric

    def search(self, qs, k: int):
        data = self.table.data[: self.table.count]
        valid = self.table.valid[: self.table.count]
        qs = jnp.asarray(np.asarray(qs, np.float32))
        if qs.ndim == 1:
            qs = qs[None, :]
        d, i = sharded_exact_search(
            self.mesh, self.metric, data, qs, k, valid=valid, axis=self.axis
        )
        if self.metric is Metric.L2:
            d = jnp.where(jnp.isinf(d), d, jnp.sqrt(jnp.maximum(d, 0.0)))
        return np.asarray(d), np.asarray(i)


class ShardedIVFFlatIndex(_ShardedWrapper):
    """One IVFFlat sub-index per row shard (the Citus-sharded deployment
    pattern, README.md:758-760).  Centers are trained per shard; queries
    fan out with the same probes and merge."""

    def __init__(self, table, metric: Metric, n_shards: int, lists: int = 100,
                 seed: int = 0):
        super().__init__(n_shards)
        from ..index.ivfflat import IVFFlatIndex
        from ..store.table import DenseTable
        from .mesh import shard_rows

        self.metric = metric
        n = table.count
        data = np.asarray(table.data[:n])
        valid = np.asarray(table.valid[:n])
        for lo, hi in shard_rows(n, n_shards):
            sub = DenseTable(table.dim, dtype=table.dtype,
                             capacity=max(hi - lo, 8))
            rows = sub.insert(data[lo:hi])
            if not valid[lo:hi].all():
                sub.delete(rows[~valid[lo:hi]])
            self.shards.append(IVFFlatIndex(sub, metric, lists=lists, seed=seed))
            self.offsets.append(lo)

    def search(self, qs, k: int, probes: Optional[int] = None):
        results = [s.search(qs, k, probes=probes) for s in self.shards]
        return self._merge(results, k)


class ShardedHNSWIndex(_ShardedWrapper):
    """One HNSW graph per row shard; fan-out + merge (SURVEY.md §7 M5)."""

    def __init__(self, table, metric: Metric, n_shards: int, m: int = 16,
                 ef_construction: int = 64, seed: int = 0, **kw):
        super().__init__(n_shards)
        from ..index.hnsw import HNSWIndex
        from ..store.table import DenseTable
        from .mesh import shard_rows

        self.metric = metric
        n = table.count
        data = np.asarray(table.data[:n])
        valid = np.asarray(table.valid[:n])
        for lo, hi in shard_rows(n, n_shards):
            sub = DenseTable(table.dim, dtype=table.dtype,
                             capacity=max(hi - lo, 8))
            rows = sub.insert(data[lo:hi])
            if not valid[lo:hi].all():
                sub.delete(rows[~valid[lo:hi]])
            self.shards.append(
                HNSWIndex(sub, metric, m=m, ef_construction=ef_construction,
                          seed=seed, **kw)
            )
            self.offsets.append(lo)

    def search(self, qs, k: int, ef_search: Optional[int] = None):
        results = [s.search(qs, k, ef_search=ef_search) for s in self.shards]
        return self._merge(results, k)
