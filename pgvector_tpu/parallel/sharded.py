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
from ..ops.topk import merge_topk, topk_smallest

#: transient budget for the DeviceSharded IVF candidate re-score — bounds
#: the per-chunk (Q, cc, D) f32 gather each shard materializes
SEARCH_CHUNK_BYTES = 2**29

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
        if all_d.shape[1] < k:
            # k exceeds the merged candidate width (tiny table): pad with
            # inf/-1 like FlatIndex instead of letting lax.top_k raise
            padw = k - all_d.shape[1]
            all_d = jnp.concatenate(
                [all_d, jnp.full((qn, padw), jnp.inf, all_d.dtype)], axis=1)
            all_i = jnp.concatenate(
                [all_i, jnp.full((qn, padw), -1, all_i.dtype)], axis=1)
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


def dim_sharded_exact_search(
    mesh: Mesh,
    metric: Metric,
    db: jnp.ndarray,  # (N, D) — will be sharded over the FEATURE dim
    qs: jnp.ndarray,  # (Q, D) — sharded over the same dim slices
    k: int,
    valid: Optional[jnp.ndarray] = None,
    axis: str = "shard",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k with the *feature* dimension sharded over the mesh —
    the huge-dim mapping SURVEY.md §5 calls for (the reference's "long
    inputs" are high-dim vectors, capped at 16k dims for the plain type,
    vector.h:11).  Each device holds a D/S column slice of every row,
    computes its partial inner products and squared-norm pieces (one MXU
    matmul over its slice), and one ``psum`` over ICI assembles the exact
    scores; every metric decomposes exactly over dim slices (IP/L2²/cosine
    from partial ip+norms; L1 as a partial elementwise sum).

    Complements ``sharded_exact_search`` (row sharding): shard rows when N
    is large, dims when D is (N · D/S per device either way — pick the
    axis that is big).  The (Q, N) score matrix materializes replicated,
    so this path expects the modest row counts that huge-dim tables have.
    """
    if metric not in (Metric.L2, Metric.IP, Metric.COSINE, Metric.L1):
        from ..errors import FeatureNotSupported

        raise FeatureNotSupported(
            f"dim_sharded_exact_search does not support {metric}: packed "
            "bit metrics do not decompose over feature slices")
    n, dim = db.shape
    n_shards = mesh.shape[axis]
    pad = (-dim) % n_shards
    if pad:  # zero columns contribute 0 to every partial — exact
        db = jnp.pad(db, ((0, 0), (0, pad)))
        qs = jnp.pad(qs, ((0, 0), (0, pad)))
    if valid is None:
        valid = jnp.ones(n, jnp.bool_)
    else:
        valid = jnp.asarray(valid[:n], jnp.bool_)

    def shard_fn(db_s, qs_s, valid_rep):
        if metric is Metric.L1:
            part = jnp.sum(
                jnp.abs(qs_s[:, None, :].astype(jnp.float32)
                        - db_s[None, :, :].astype(jnp.float32)), axis=-1)
            s = jax.lax.psum(part, axis)
        else:
            ip = jax.lax.dot_general(
                qs_s.astype(jnp.float32), db_s.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=D.dot_precision(),
            )
            ip = jax.lax.psum(ip, axis)
            if metric is Metric.IP:
                s = -ip
            elif metric is Metric.L2:
                q_sq = jax.lax.psum(
                    jnp.sum(qs_s.astype(jnp.float32) ** 2, axis=1), axis)
                d_sq = jax.lax.psum(
                    jnp.sum(db_s.astype(jnp.float32) ** 2, axis=1), axis)
                s = jnp.maximum(q_sq[:, None] - 2.0 * ip + d_sq[None, :], 0.0)
            elif metric is Metric.COSINE:
                q_n = jnp.sqrt(jax.lax.psum(
                    jnp.sum(qs_s.astype(jnp.float32) ** 2, axis=1), axis))
                d_n = jnp.sqrt(jax.lax.psum(
                    jnp.sum(db_s.astype(jnp.float32) ** 2, axis=1), axis))
                denom = q_n[:, None] * d_n[None, :]
                s = jnp.where(denom > 0, 1.0 - ip / jnp.where(denom > 0, denom, 1.0),
                              jnp.inf)
        s = jnp.where(valid_rep[None, :], s, jnp.inf)
        qn = s.shape[0]
        d, i = topk_smallest(s, min(k, n))
        if d.shape[1] < k:
            d = jnp.concatenate(
                [d, jnp.full((qn, k - d.shape[1]), jnp.inf, d.dtype)], axis=1)
            i = jnp.concatenate(
                [i, jnp.full((qn, k - i.shape[1]), -1, i.dtype)], axis=1)
        return d, jnp.where(jnp.isinf(d), -1, i)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,  # psum makes the scores (hence outputs) replicated
    )
    return fn(db, qs, valid)


# ---------------------------------------------------------------------------
# sharded k-means step — data parallel over samples, psum of center sums
# ---------------------------------------------------------------------------


def sharded_kmeans_step(
    mesh: Mesh,
    data: jnp.ndarray,  # (S, D) sharded over samples
    centers: jnp.ndarray,  # (k, D) replicated
    axis: str = "shard",
    spherical: bool = False,
    binary: bool = False,
    key: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One Lloyd's iteration over a sample-sharded dataset: local assignment
    matmul + local per-center partial sums, reduced with psum over ICI —
    the data-parallel analogue of the reference's parallel build workers
    feeding one shared state (SURVEY.md §2.4.2-3).  ``spherical``/``binary``
    apply the reference's per-round center normalization hooks
    (NormCenters ivfkmeans.c:96-105; bit threshold ivfutils.c:282-423).

    ``key`` enables the empty-cluster random reseed (ivfkmeans.c:222-227,
    matching the single-chip _new_centers): every shard derives the same
    candidate global row ids from the replicated key; the owning shard
    contributes each sampled row and a psum replicates it.  Without a key,
    empty clusters keep their previous center."""
    s = data.shape[0]
    n_shards = mesh.shape[axis]
    pad = (-s) % n_shards
    k = centers.shape[0]
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
    weights = jnp.concatenate([jnp.ones(s), jnp.zeros(pad)])
    reseed = key is not None
    if key is None:
        key = jnp.zeros((2,), jnp.uint32)
    key = jnp.asarray(key)

    def shard_fn(data_s, w_s, centers_rep, key_rep):
        ip = jax.lax.dot_general(
            data_s, centers_rep,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if spherical:
            assign = jnp.argmax(ip, axis=1)
        else:
            c_sq = jnp.sum(centers_rep * centers_rep, axis=1)
            assign = jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=1)
        sums = jax.ops.segment_sum(data_s * w_s[:, None], assign, num_segments=k)
        counts = jax.ops.segment_sum(w_s, assign, num_segments=k)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        if reseed:
            # empty-cluster reseed BEFORE the normalize/threshold hooks,
            # matching _new_centers: sample k global rows from the
            # replicated key; the owning shard contributes each row
            shard_i = jax.lax.axis_index(axis)
            rows_per = data_s.shape[0]
            rand_rows = jax.random.randint(key_rep, (k,), 0, s)
            local = rand_rows - shard_i * rows_per
            owned = (local >= 0) & (local < rows_per)
            contrib = jnp.where(
                owned[:, None], data_s[jnp.clip(local, 0, rows_per - 1)], 0.0)
            sampled = jax.lax.psum(contrib, axis)
            new_centers = jnp.where((counts == 0)[:, None], sampled,
                                    new_centers)
        else:
            new_centers = jnp.where((counts == 0)[:, None], centers_rep,
                                    new_centers)
        if spherical:
            norms = jnp.sqrt(jnp.sum(new_centers**2, axis=1, keepdims=True))
            new_centers = new_centers / jnp.maximum(norms, 1e-30)
        if binary:
            new_centers = (new_centers > 0.5).astype(jnp.float32)
        return new_centers

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None), P(None)),
        out_specs=P(None, None),
        check_vma=False,  # psum makes the outputs replicated
    )
    return fn(data, weights, centers, key)


def train_centers_sharded(
    mesh: Mesh,
    data: jnp.ndarray,
    k: int,
    *,
    axis: str = "shard",
    spherical: bool = False,
    binary: bool = False,
    seed: int = 0,
    max_iters: int = 500,
) -> jnp.ndarray:
    """Full IVF center training with sample-sharded Lloyd iterations — the
    device-parallel analogue of the reference's parallel k-means phase
    (ivfbuild.c:829-966).  Seeding (k-means++) is sequential by nature and
    runs replicated; each Lloyd round is one sharded step with psum'd
    center statistics over ICI.  Early exit when centers stop moving
    (assignment-change exit of ivfkmeans.c:347 is equivalent at fixpoint).
    Empty clusters reseed from random samples each round and the single-chip
    post-checks apply (ivfkmeans.c:222-227, 490-547)."""
    from ..index.ivf_kmeans import _kmeanspp_init, train_centers

    data = data.astype(jnp.float32)
    if data.shape[0] < k:
        # tiny tables don't need the mesh; reuse the single-chip
        # sample-tiling path so both entry points agree
        return train_centers(data, k, spherical=spherical, binary=binary,
                             seed=seed)
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    init = _kmeanspp_init(data, k_init, k, spherical)
    if binary:
        init = (init > 0.5).astype(jnp.float32)
    centers = init
    step = jax.jit(
        lambda d, c, kk: sharded_kmeans_step(
            mesh, d, c, axis=axis, spherical=spherical, binary=binary, key=kk
        )
    )
    for _ in range(max_iters):
        key, sub = jax.random.split(key)
        new = step(data, centers, sub)
        if bool(jnp.all(new == centers)):
            centers = new
            break
        centers = new
    # post-checks (ivfkmeans.c:490-547), matching train_centers
    from ..errors import InternalError

    centers_host = jax.device_get(centers)
    if np.isnan(centers_host).any() or np.isinf(centers_host).any():
        raise InternalError(
            "k-means produced non-finite centers. Please report a bug.")
    if spherical and (np.linalg.norm(centers_host, axis=1) == 0).any():
        raise InternalError(
            "k-means produced a zero-norm center for a spherical metric."
            " Please report a bug.")
    return centers


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

        self.metric = metric
        self.shards, self.subs, g_rows = _build_shards(
            table, n_shards,
            lambda sub: IVFFlatIndex(sub, metric, lists=lists, seed=seed))
        self.offsets = [int(g[0]) if len(g) else 0 for g in g_rows]

    def search(self, qs, k: int, probes: Optional[int] = None):
        results = [s.search(qs, k, probes=probes) for s in self.shards]
        return self._merge(results, k)


class ShardedHNSWIndex(_ShardedWrapper):
    """One HNSW graph per row shard; fan-out + merge (SURVEY.md §7 M5)."""

    def __init__(self, table, metric: Metric, n_shards: int, m: int = 16,
                 ef_construction: int = 64, seed: int = 0, **kw):
        super().__init__(n_shards)
        from ..index.hnsw import HNSWIndex

        self.metric = metric
        self.shards, self.subs, g_rows = _build_shards(
            table, n_shards,
            lambda sub: HNSWIndex(sub, metric, m=m,
                                  ef_construction=ef_construction,
                                  seed=seed, **kw))
        self.offsets = [int(g[0]) if len(g) else 0 for g in g_rows]

    def search(self, qs, k: int, ef_search: Optional[int] = None):
        results = [s.search(qs, k, ef_search=ef_search) for s in self.shards]
        return self._merge(results, k)


# ---------------------------------------------------------------------------
# device-placed sharded indexes — per-device graph/posting arrays under a
# Mesh, ONE jitted fan-out per query batch, all_gather top-k merge over ICI
# (SURVEY.md §7 M5).  Builds run per shard on the host (index construction
# is offline); the stacked arrays are placed with a NamedSharding so each
# device holds exactly its shard, and the search is a single shard_map.
# ---------------------------------------------------------------------------


def _pad_to(a: jnp.ndarray, shape, fill) -> jnp.ndarray:
    """Pad ``a`` with ``fill`` up to ``shape`` in every dimension (shards
    grow independently — capacity doublings and posting-cap growth can
    desynchronize ANY axis, not just the leading one)."""
    if tuple(a.shape) == tuple(shape):
        return a
    out = jnp.full(shape, fill, a.dtype)
    return jax.lax.dynamic_update_slice(out, a, (0,) * a.ndim)


def _stack_sharded(mesh: Mesh, axis: str, blocks, fill) -> jnp.ndarray:
    """Stack per-shard host blocks (padded to a common shape) into one
    (S, ...) array placed shard-per-device on the mesh."""
    from jax.sharding import NamedSharding

    blocks = [jnp.asarray(b) for b in blocks]
    shape = tuple(max(b.shape[d] for b in blocks)
                  for d in range(blocks[0].ndim))
    stacked = jnp.stack([_pad_to(b, shape, fill) for b in blocks])
    spec = P(axis, *([None] * (stacked.ndim - 1)))
    return jax.device_put(stacked, NamedSharding(mesh, spec))


def _slice_table(table, lo: int, hi: int):
    """Sub-table holding rows [lo, hi) of ``table`` — same kind (dense /
    bit / sparse), copied column-by-column on device with the validity
    mask intact (deleted rows stay deleted in the shard)."""
    from ..store.table import BitTable, DenseTable, SparseTable

    n = hi - lo
    cap = max(n, 8)
    if isinstance(table, DenseTable):
        sub = DenseTable(table.dim, dtype=table.dtype, capacity=cap)
        cols = ("data",)
    elif isinstance(table, BitTable):
        sub = BitTable(table.dim, capacity=cap)
        cols = ("data",)
    elif isinstance(table, SparseTable):
        sub = SparseTable(table.dim, nnz_cap=table.nnz_cap, capacity=cap)
        cols = ("idx", "val")
    else:
        raise TypeError(f"unsupported table type {type(table).__name__}")
    for c in cols:
        setattr(sub, c, getattr(sub, c).at[:n].set(getattr(table, c)[lo:hi]))
    sub.valid = sub.valid.at[:n].set(table.valid[lo:hi])
    sub.count = n
    return sub


def _build_shards(table, n_shards: int, make_index, parallel: bool = True):
    """Partition the table into contiguous row ranges and build one
    sub-index per range — CONCURRENTLY.  The reference parallelizes one
    build across DSM workers (HnswBeginParallel, hnswbuild.c:925-1062);
    here each shard's build is an independent stream of device programs,
    so a thread per shard keeps every shard's dispatch queue full (host
    bookkeeping interleaves under the GIL; device work overlaps).

    Returns (indexes, sub_tables, g_rows) where ``g_rows[s]`` maps shard
    ``s``'s local row ids to global table row ids."""
    from concurrent.futures import ThreadPoolExecutor

    from .mesh import shard_rows

    n = table.count
    subs, g_rows = [], []
    for lo, hi in shard_rows(n, n_shards):
        subs.append(_slice_table(table, lo, hi))
        g_rows.append(np.arange(lo, hi, dtype=np.int32))
    if parallel and n_shards > 1:
        with ThreadPoolExecutor(max_workers=n_shards) as pool:
            shards = list(pool.map(make_index, subs))
    else:
        shards = [make_index(s) for s in subs]
    return shards, subs, g_rows


class DeviceShardedHNSWIndex:
    """Row-range-sharded HNSW with device-resident shards.

    Each shard's graph arrays (values, nbr0, nbr_up, up_slot, elem_rows)
    live on its own device; ``search`` runs ONE jitted shard_map: every
    device executes the full Algorithm 5 mono-jit against its local graph
    with the replicated query batch, converts element rows to global row
    ids, and the per-shard top-k candidates merge with an all_gather over
    ICI — the device-placed replacement for the round-1 host fan-out loop
    (the Citus-sharded deployment pattern, README.md:758-760).

    The per-shard single-chip indexes are retained, so the full lifecycle
    works sharded: ``insert`` routes new rows to the least-loaded shard,
    ``vacuum`` propagates deletes and repairs every shard's graph, and
    ``save``/``load`` checkpoint shard-by-shard (replication as state
    transfer, test/t/001 methodology).

    On a 2-D mesh (``make_mesh2``) pass ``qaxis`` to ALSO data-parallelize
    the query batch: the graph replicates over ``qaxis`` (XLA places one
    copy per replica column) and each replica searches its slice of the
    batch — per-query work is unchanged, so read QPS scales with replicas.
    This is the reference's scale-reads-by-adding-backends/replicas story
    (pgbench clients in test/t/016; streaming replicas in test/t/001)."""

    def __init__(self, mesh: Mesh, table, metric: Metric, axis: str = "shard",
                 m: int = 16, ef_construction: int = 64, seed: int = 0,
                 qaxis: Optional[str] = None,
                 _defer_build: bool = False, **kw):
        from ..index.hnsw import HEAPTIDS, HNSWIndex

        self.mesh = mesh
        self.axis = axis
        if qaxis is not None and qaxis not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {qaxis!r}")
        self.qaxis = qaxis
        self.metric = metric
        self.m = m
        self.ef_construction = ef_construction
        self.seed = seed
        self.heaptids = HEAPTIDS
        self.table = table
        self._search_cache = {}
        if _defer_build:  # load() fills shards itself
            return

        def make_index(sub):
            return HNSWIndex(sub, metric, m=m,
                             ef_construction=ef_construction, seed=seed, **kw)

        self.shards, self.subs, self.g_rows = _build_shards(
            table, mesh.shape[axis], make_index)
        self._restack()

    # ------------------------------------------------------- device placement
    def _restack(self) -> None:
        """(Re)place every shard's graph arrays shard-per-device.  Local
        element rows globalize through g_rows (local row → global row)."""
        mesh, axis, shards = self.mesh, self.axis, self.shards
        self.kind = shards[0].kind
        #: densified-query scorer dim (sparse moderate-dim) — same policy as
        #: the single-device scan, see HNSWIndex._scorer_sdim
        self._sdim = shards[0]._scorer_sdim()
        # shard capacities derive their own unroll depths (allocation
        # tracks the depth since round 4) — equalize widths so the
        # per-shard nbr_up arrays stack
        depth = max(s.nbr_up.shape[1] for s in shards)
        for s in shards:
            s._ensure_unroll_depth(depth)
        self._l_unroll = max(max(s._l_unroll for s in shards), depth)
        for s in shards:
            s._sync_device_meta()
        self.values = tuple(
            _stack_sharded(mesh, axis, [s.values[j] for s in shards], 0)
            for j in range(len(shards[0].values))
        )
        self.nbr0 = _stack_sharded(mesh, axis, [s.nbr0 for s in shards], -1)
        self.nbr_up = _stack_sharded(mesh, axis, [s.nbr_up for s in shards], -1)
        self.up_slot = _stack_sharded(
            mesh, axis, [s._up_slot_dev for s in shards], -1)
        glob_rows = []
        for s, g in zip(shards, self.g_rows):
            er = s.elem_rows.astype(np.int64)
            g_pad = np.concatenate([g.astype(np.int64), [-1]])
            glob_rows.append(
                np.where(er >= 0, g_pad[np.minimum(er, len(g) - 1)], -1)
                .astype(np.int32))
        self.elem_rows = _stack_sharded(mesh, axis, glob_rows, -1)
        self.entry = _stack_sharded(
            mesh, axis, [np.asarray([s.entry], np.int32) for s in shards], -1
        )[:, 0]
        self.entry_level = _stack_sharded(
            mesh, axis,
            [np.asarray([s.entry_level], np.int32) for s in shards], -1
        )[:, 0]
        self._search_cache = {}

    # ------------------------------------------------------------- mutations
    def insert(self, rows) -> None:
        """aminsert, sharded: each new global row goes to the least-loaded
        shard (insert-time balancing; the reference's analogue is Citus
        routing rows by distribution key)."""
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        data = np.asarray(self.table.data[rows])
        loads = np.array([sub.count for sub in self.subs])
        # round-robin from the least-loaded shard for a balanced batch
        order = np.argsort(loads, kind="stable")
        pick = order[np.arange(len(rows)) % len(self.subs)]
        for s in range(len(self.subs)):
            sel = pick == s
            if not sel.any():
                continue
            local = self.subs[s].insert(data[sel])
            self.shards[s].insert(local)
            self.g_rows[s] = np.concatenate(
                [self.g_rows[s], rows[sel].astype(np.int32)])
        self._restack()

    def vacuum(self) -> None:
        """Propagate global deletes to every shard, then run each shard's
        4-pass repair (hnswvacuum.c:777-797)."""
        valid = np.asarray(self.table.valid)
        for s, sub, g in zip(self.shards, self.subs, self.g_rows):
            sub_valid = np.asarray(sub.valid[: sub.count])
            dead = np.flatnonzero(sub_valid & ~valid[g])
            if len(dead):
                sub.delete(dead)
            s.vacuum()
        self._restack()

    # ------------------------------------------------------------ checkpoint
    def save(self, path: str) -> None:
        import json
        import os

        from ..io import checkpoint as ckpt

        os.makedirs(path, exist_ok=True)
        for j, (s, sub, g) in enumerate(
                zip(self.shards, self.subs, self.g_rows)):
            ckpt.save_table(sub, os.path.join(path, f"shard{j}_table"))
            ckpt.save_hnsw(s, os.path.join(path, f"shard{j}_index"))
            np.save(os.path.join(path, f"shard{j}_grows.npy"), g)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump({"magic": ckpt.MAGIC, "version": ckpt.FORMAT_VERSION,
                       "object": "sharded_hnsw",
                       "n_shards": len(self.shards),
                       "metric": self.metric.name, "m": self.m,
                       "ef_construction": self.ef_construction,
                       "seed": self.seed}, f)

    @classmethod
    def load(cls, mesh: Mesh, table, path: str, axis: str = "shard",
             qaxis: Optional[str] = None):
        import json
        import os

        from ..io import checkpoint as ckpt

        with open(os.path.join(path, "manifest.json")) as f:
            man = json.load(f)
        if man.get("object") != "sharded_hnsw":
            from ..errors import DataException

            raise DataException("expected a sharded_hnsw checkpoint")
        self = cls(mesh, table, Metric[man["metric"]], axis=axis,
                   m=man["m"], ef_construction=man["ef_construction"],
                   seed=man["seed"], qaxis=qaxis, _defer_build=True)
        self.shards, self.subs, self.g_rows = [], [], []
        for j in range(man["n_shards"]):
            sub = ckpt.load_table(os.path.join(path, f"shard{j}_table"))
            idx = ckpt.load_hnsw(sub, os.path.join(path, f"shard{j}_index"))
            self.subs.append(sub)
            self.shards.append(idx)
            self.g_rows.append(
                np.load(os.path.join(path, f"shard{j}_grows.npy")))
        self._restack()
        return self

    # ---------------------------------------------------------------- search
    def _make_search(self, ef: int, k: int, expand: int):
        from ..index import hnsw_kernels as K

        axis = self.axis
        kind, metric, m = self.kind, self.metric, self.m
        l_unroll, heaptids = self._l_unroll, self.heaptids
        sdim = self._sdim
        n_val = len(self.values)

        def shard_fn(*args):
            vals = tuple(a[0] for a in args[:n_val])
            (nbr0_s, nbr_up_s, up_slot_s, elem_rows_s, entry_s, entlv_s,
             row_valid, fmask, qs) = args[n_val:]
            d, r, _, _ = K.query_search(
                kind, metric, vals, nbr0_s[0], nbr_up_s[0], up_slot_s[0],
                elem_rows_s[0], row_valid, fmask, qs, entry_s[0], entlv_s[0],
                ef=ef, m=m, l_unroll=l_unroll, k=k, heaptids=heaptids,
                expand=expand, sdim=sdim,
            )
            all_d = jax.lax.all_gather(d, axis, axis=0)  # (S, Q, k)
            all_i = jax.lax.all_gather(r, axis, axis=0)
            qn = qs.shape[0]
            all_d = jnp.moveaxis(all_d, 0, 1).reshape(qn, -1)
            all_i = jnp.moveaxis(all_i, 0, 1).reshape(qn, -1)
            md, mi = topk_smallest(all_d, k, ids=all_i)
            return md, jnp.where(jnp.isinf(md), -1, mi)

        sharded = [P(axis, *([None] * (v.ndim - 1))) for v in self.values]
        qspec = P(self.qaxis, None) if self.qaxis else P(None, None)
        in_specs = tuple(sharded) + (
            P(axis, None), P(axis, None, None), P(axis, None),
            P(axis, None), P(axis), P(axis),
            P(None), P(None), qspec,
        )
        fn = jax.shard_map(
            shard_fn, mesh=self.mesh, in_specs=in_specs,
            # without qaxis the all_gather merge replicates the outputs;
            # with it each replica column owns its query slice
            out_specs=(qspec, qspec),
            check_vma=False,
        )
        return jax.jit(fn)

    def search(self, qs, k: int, ef_search: Optional[int] = None,
               expand: int = 1):
        from ..config import config
        from ..index.flat import _coerce_dense_queries

        ef = int(config.validate("hnsw.ef_search", ef_search)
                 if ef_search is not None else config.get("hnsw.ef_search"))
        qs = _coerce_dense_queries(qs, self.table.dim)
        if self.metric is Metric.COSINE:
            norms = jnp.sqrt(jnp.sum(qs * qs, axis=1, keepdims=True))
            qs = qs / jnp.maximum(norms, 1e-30)
        key = (ef, k, expand)
        if key not in self._search_cache:
            self._search_cache[key] = self._make_search(ef, k, expand)
        qn = qs.shape[0]
        rep = self.mesh.shape[self.qaxis] if self.qaxis else 1
        if qn % rep:  # query batch must split evenly over the replica axis
            qs = jnp.pad(qs, ((0, (-qn) % rep), (0, 0)))
        row_valid = self.table.valid
        fmask = jnp.ones(self.table.capacity, jnp.bool_)
        d, r = self._search_cache[key](
            *self.values, self.nbr0, self.nbr_up, self.up_slot,
            self.elem_rows, self.entry, self.entry_level,
            row_valid, fmask, qs,
        )
        if self.metric is Metric.L2:
            d = jnp.where(jnp.isinf(d), d, jnp.sqrt(jnp.maximum(d, 0.0)))
        elif self.metric is Metric.COSINE:
            d = jnp.where(jnp.isinf(d), d, 1.0 + d)
        return np.asarray(d)[:qn], np.asarray(r)[:qn]


class DeviceShardedIVFFlatIndex:
    """Row-range-sharded IVFFlat with device-resident shards: per-device
    centroids + posting matrices + vector blocks, one jitted shard_map per
    query batch (probe order → candidate gather → score → local top-k →
    all_gather merge).  Centers are trained per shard (the Citus pattern:
    every shard runs its own CREATE INDEX).  Shards build concurrently;
    insert/vacuum/save/load run the full lifecycle sharded.  On a 2-D mesh
    (``make_mesh2``) ``qaxis`` splits the query batch over replica columns
    (see DeviceShardedHNSWIndex)."""

    def __init__(self, mesh: Mesh, table, metric: Metric, axis: str = "shard",
                 lists: int = 100, seed: int = 0, qaxis: Optional[str] = None,
                 _defer_build: bool = False,
                 **kw):
        from ..index.ivfflat import IVFFlatIndex

        self.mesh = mesh
        self.axis = axis
        if qaxis is not None and qaxis not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {qaxis!r}")
        self.qaxis = qaxis
        self.metric = metric
        self.lists = lists
        self.seed = seed
        self.table = table
        self._normalized = metric is Metric.COSINE
        self._search_cache = {}
        if _defer_build:
            return

        def make_index(sub):
            return IVFFlatIndex(sub, metric, lists=lists, seed=seed, **kw)

        self.shards, self.subs, self.g_rows = _build_shards(
            table, mesh.shape[axis], make_index)
        self._restack()

    def _restack(self) -> None:
        mesh, axis = self.mesh, self.axis
        self.centroids = _stack_sharded(
            mesh, axis, [s.centroids for s in self.shards], 0)
        self.postings = _stack_sharded(
            mesh, axis, [np.asarray(s.postings) for s in self.shards], -1)
        self.data = _stack_sharded(
            mesh, axis, [np.asarray(sub.data) for sub in self.subs], 0)
        self.grows = _stack_sharded(mesh, axis, self.g_rows, -1)
        self._search_cache = {}

    def insert(self, rows) -> None:
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        data = np.asarray(self.table.data[rows])
        loads = np.array([sub.count for sub in self.subs])
        order = np.argsort(loads, kind="stable")
        pick = order[np.arange(len(rows)) % len(self.subs)]
        for s in range(len(self.subs)):
            sel = pick == s
            if not sel.any():
                continue
            local = self.subs[s].insert(data[sel])
            self.shards[s].insert(local)
            self.g_rows[s] = np.concatenate(
                [self.g_rows[s], rows[sel].astype(np.int32)])
        self._restack()

    def vacuum(self) -> None:
        valid = np.asarray(self.table.valid)
        for s, sub, g in zip(self.shards, self.subs, self.g_rows):
            sub_valid = np.asarray(sub.valid[: sub.count])
            dead = np.flatnonzero(sub_valid & ~valid[g])
            if len(dead):
                sub.delete(dead)
            s.vacuum()
        self._restack()

    def save(self, path: str) -> None:
        import json
        import os

        from ..io import checkpoint as ckpt

        os.makedirs(path, exist_ok=True)
        for j, (s, sub, g) in enumerate(
                zip(self.shards, self.subs, self.g_rows)):
            ckpt.save_table(sub, os.path.join(path, f"shard{j}_table"))
            ckpt.save_ivfflat(s, os.path.join(path, f"shard{j}_index"))
            np.save(os.path.join(path, f"shard{j}_grows.npy"), g)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump({"magic": ckpt.MAGIC, "version": ckpt.FORMAT_VERSION,
                       "object": "sharded_ivfflat",
                       "n_shards": len(self.shards),
                       "metric": self.metric.name, "lists": self.lists,
                       "seed": self.seed}, f)

    @classmethod
    def load(cls, mesh: Mesh, table, path: str, axis: str = "shard",
             qaxis: Optional[str] = None):
        import json
        import os

        from ..io import checkpoint as ckpt

        with open(os.path.join(path, "manifest.json")) as f:
            man = json.load(f)
        if man.get("object") != "sharded_ivfflat":
            from ..errors import DataException

            raise DataException("expected a sharded_ivfflat checkpoint")
        self = cls(mesh, table, Metric[man["metric"]], axis=axis,
                   lists=man["lists"], seed=man["seed"], qaxis=qaxis,
                   _defer_build=True)
        self.shards, self.subs, self.g_rows = [], [], []
        for j in range(man["n_shards"]):
            sub = ckpt.load_table(os.path.join(path, f"shard{j}_table"))
            idx = ckpt.load_ivfflat(sub, os.path.join(path, f"shard{j}_index"))
            self.subs.append(sub)
            self.shards.append(idx)
            self.g_rows.append(
                np.load(os.path.join(path, f"shard{j}_grows.npy")))
        self._restack()
        return self

    def _make_search(self, probes: int, k: int):
        axis = self.axis
        metric = self.metric
        normalized = self._normalized

        def shard_fn(cent_s, post_s, data_s, grows_s, row_valid, fmask, qs):
            cent, post, data, grows = (cent_s[0], post_s[0], data_s[0],
                                       grows_s[0])
            # probe order (GetScanLists): distance to local centers
            ip = jax.lax.dot_general(
                qs, cent, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=D.dot_precision(),
            )
            if metric in (Metric.IP, Metric.COSINE):
                cscore = -ip
            else:
                c_sq = jnp.sum(cent * cent, axis=1)
                cscore = c_sq[None, :] - 2.0 * ip
            _, order = jax.lax.top_k(-cscore, probes)  # (Q, P)
            cand_all = post[order].reshape(qs.shape[0], -1)  # (Q, C) local

            def score_cands(cand):
                gcand = jnp.where(cand >= 0, grows[jnp.maximum(cand, 0)], -1)
                safe_g = jnp.maximum(gcand, 0)
                ok = (gcand >= 0) & row_valid[safe_g] & fmask[safe_g]
                v = data[jnp.maximum(cand, 0)].astype(jnp.float32)
                if normalized:
                    nrm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
                    v = v / jnp.maximum(nrm, 1e-30)
                vip = jax.lax.dot_general(
                    qs, v, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=D.dot_precision(),
                )
                if metric is Metric.L2:
                    vsq = jnp.sum(v * v, axis=-1)
                    qsq = jnp.sum(qs * qs, axis=-1)[:, None]
                    s = jnp.maximum(qsq - 2.0 * vip + vsq, 0.0)
                else:
                    s = -vip
                return jnp.where(ok, s, jnp.inf), gcand

            # C = probes · cap, where cap is the PADDED per-list width
            # (pow2 of the longest list) — under k-means skew an unchunked
            # (Q, C, Dm) gather is tens of GB.  Stream candidate chunks
            # with a running top-k merge (bounded ~0.5 GB transients);
            # also pads k > C with inf/-1 instead of crashing lax.top_k.
            qn = qs.shape[0]
            C = cand_all.shape[1]
            dim = data.shape[1]
            cc = min(C, max(64, SEARCH_CHUNK_BYTES // max(1, qn * dim * 4)))
            d = jnp.full((qn, k), jnp.inf, jnp.float32)
            i = jnp.full((qn, k), -1, jnp.int32)
            for s0 in range(0, C, cc):
                sc, gc = score_cands(cand_all[:, s0:s0 + cc])
                d, i = merge_topk(d, i, sc, gc, k)
            i = jnp.where(jnp.isinf(d), -1, i)
            all_d = jax.lax.all_gather(d, axis, axis=0)
            all_i = jax.lax.all_gather(i, axis, axis=0)
            qn = qs.shape[0]
            all_d = jnp.moveaxis(all_d, 0, 1).reshape(qn, -1)
            all_i = jnp.moveaxis(all_i, 0, 1).reshape(qn, -1)
            md, mi = topk_smallest(all_d, k, ids=all_i)
            return md, jnp.where(jnp.isinf(md), -1, mi)

        qspec = P(self.qaxis, None) if self.qaxis else P(None, None)
        fn = jax.shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(axis, None, None), P(axis, None, None),
                      P(axis, None, None), P(axis, None),
                      P(None), P(None), qspec),
            out_specs=(qspec, qspec),
            check_vma=False,
        )
        return jax.jit(fn)

    def search(self, qs, k: int, probes: Optional[int] = None):
        from ..config import config
        from ..index.flat import _coerce_dense_queries

        probes = int(config.validate("ivfflat.probes", probes)
                     if probes is not None else config.get("ivfflat.probes"))
        probes = min(probes, self.lists)
        qs = _coerce_dense_queries(qs, self.table.dim)
        if self._normalized:
            norms = jnp.sqrt(jnp.sum(qs * qs, axis=1, keepdims=True))
            qs = qs / jnp.maximum(norms, 1e-30)
        key = (probes, k)
        if key not in self._search_cache:
            self._search_cache[key] = self._make_search(probes, k)
        qn = qs.shape[0]
        rep = self.mesh.shape[self.qaxis] if self.qaxis else 1
        if qn % rep:  # query batch must split evenly over the replica axis
            qs = jnp.pad(qs, ((0, (-qn) % rep), (0, 0)))
        row_valid = self.table.valid
        fmask = jnp.ones(self.table.capacity, jnp.bool_)
        d, r = self._search_cache[key](
            self.centroids, self.postings, self.data, self.grows,
            row_valid, fmask, qs,
        )
        if self.metric is Metric.L2:
            d = jnp.where(jnp.isinf(d), d, jnp.sqrt(jnp.maximum(d, 0.0)))
        elif self.metric is Metric.COSINE:
            d = jnp.where(jnp.isinf(d), d, 1.0 + d)
        return np.asarray(d)[:qn], np.asarray(r)[:qn]
