"""HNSW index — the TPU rewrite of the reference's flagship access method
(src/hnsw.c, hnswbuild.c, hnswinsert.c, hnswscan.c, hnswutils.c,
hnswvacuum.c).

Graph layout (SURVEY.md §7): elements are rows of padded HBM arrays instead
of buffer pages —

- ``values``        — formed index values (the vector copies of
                      HnswElementTupleData, hnsw.h:372-382); normalized for
                      cosine opclasses (sql/vector.sql:437-441)
- ``nbr0``          — int32[cap, 2m] level-0 neighbors (lm = 2m at level 0,
                      hnsw.h:127)
- ``nbr_up``        — int32[cap_up, L, m] upper-level neighbors for the
                      ~1/m fraction of elements with level ≥ 1
- ``levels``        — int32[cap] element levels, level = floor(-ln(U)·ml),
                      ml = 1/ln(m) (hnswutils.c:249, hnsw.h:130)
- ``elem_rows``     — int32[cap, 10] heap-TID multiplexing: duplicate
                      vectors share one element with up to 10 row ids
                      (hnsw.h:69, hnswinsert.c:585-636)

Build is *wave-parallel* (SURVEY.md §7 M3): instead of the reference's
process-parallel shared-memory graph with per-element LWLocks
(hnswbuild.c:382-480), batches of B elements search the frozen graph
together (one batched beam kernel), select neighbors together (one masked
pairwise kernel), then apply backlink updates grouped by target.  Wave
sizes grow geometrically so early elements see a connected graph.  This
accepts the same class of approximation the reference accepts under
concurrent inserts (insert-order nondeterminism); recall parity is enforced
by tests mirroring test/t/012.

Scan is Algorithm 5 (hnswscan.c:25-56): greedy descent through upper
levels, ef_search beam at layer 0, then heap-TID expansion + validity/
filter masking.  Iterative scans (hnsw.iterative_scan) re-run with doubled
ef until enough results pass the filter, bounded by hnsw.max_scan_tuples.

Vacuum is the 4-pass repair (hnswvacuum.c:777-797): drop dead TIDs →
repair affected neighbor lists via re-search → verify ("hnsw graph not
repaired", hnswvacuum.c:578) → free slots.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..errors import DataException, FeatureNotSupported, InternalError
from ..ops import distance as D
from ..ops.metric import Metric
from ..store.table import BitTable, DenseTable, SparseTable
from ..utils.stats import ScanStats
from ..utils.telemetry import Progress, timers
from . import hnsw_kernels as K

# reloption bounds — src/hnsw.h:53-62
DEFAULT_M = 16
MIN_M, MAX_M = 2, 100
DEFAULT_EF_CONSTRUCTION = 64
MIN_EF_CONSTRUCTION, MAX_EF_CONSTRUCTION = 4, 1000

#: per-type dimension caps (hnswutils.c:1375-1431, hnsw.h:33-34)
MAX_DIM_F32 = 2000
MAX_DIM_F16 = 4000
MAX_DIM_BIT = 64000
MAX_NNZ_SPARSE = 1000

#: heap TIDs per element (hnsw.h:69)
HEAPTIDS = 10

#: static upper-level array depth; P(level ≥ 12) = m^-12 — unreachable
L_MAX = 12

DENSE_OPCLASSES = (Metric.L2, Metric.IP, Metric.COSINE, Metric.L1)
BIT_OPCLASSES = (Metric.HAMMING, Metric.JACCARD)
SPARSE_OPCLASSES = (Metric.L2, Metric.IP, Metric.COSINE, Metric.L1)


class HNSWIndex:
    """An HNSW access method over a Dense/Bit/Sparse table."""

    def __init__(
        self,
        table,
        metric: Metric,
        m: int = DEFAULT_M,
        ef_construction: int = DEFAULT_EF_CONSTRUCTION,
        seed: int = 0,
        build: bool = True,
        wave_size: int = 1024,
        beam_expand: int = 1,
        backlink_mode: str = "wholesale",
        dedup: bool = True,
        notice_hook=None,
        progress=None,
        capacity: Optional[int] = None,
        build_mesh=None,
    ):
        if not MIN_M <= m <= MAX_M:
            raise DataException(f'value {m} out of bounds for option "m"')
        if not MIN_EF_CONSTRUCTION <= ef_construction <= MAX_EF_CONSTRUCTION:
            raise DataException(
                f'value {ef_construction} out of bounds for option "ef_construction"'
            )
        if ef_construction < 2 * m:
            # hnswbuild.c:713-716
            raise DataException("ef_construction must be greater than or equal to 2 * m")
        self.table = table
        self.metric = metric
        self.m = m
        self.ef_construction = ef_construction
        self.seed = seed
        self.wave_size = wave_size
        #: candidates expanded per beam hop (1 = exact Algorithm 2 order;
        #: >1 = fewer sequential hops at the same ef bound)
        self.beam_expand = beam_expand
        #: "wholesale" = one SelectNeighbors over old ∪ new per target per
        #: wave (fast; recall-equivalent with intra-wave candidates);
        #: "incremental" = the reference's per-source one-eviction fold
        #: (hnswutils.c:1181-1229)
        self.backlink_mode = backlink_mode
        #: optional jax.sharding.Mesh: wave searches (the dominant build
        #: cost) run data-parallel over its first axis, building ONE graph
        #: with bit-identical results — the SPMD counterpart of the
        #: reference's multi-process shared-memory build
        #: (hnswbuild.c:925-1062); see K.wave_search_sharded
        self.build_mesh = build_mesh
        self.dedup = dedup
        self.notice_hook = notice_hook or (lambda msg: None)
        self.progress = progress or Progress()
        #: pg_stat_user_indexes / nsearches analogue (utils/stats.py)
        self.stats = ScanStats()
        self.ml = 1.0 / math.log(m)  # hnsw.h:130
        self._mem_notice_fired = False
        self._wave_eff = wave_size  # wave size after the memory budget

        if isinstance(table, DenseTable):
            self.kind = "dense"
            if metric not in DENSE_OPCLASSES:
                raise FeatureNotSupported(
                    f"operator {metric.op} is not supported by hnsw for vectors"
                )
            cap = MAX_DIM_F16 if table.dtype != jnp.float32 else MAX_DIM_F32
            if table.dim > cap:
                raise DataException(
                    f"column cannot have more than {cap} dimensions for hnsw index"
                )
        elif isinstance(table, BitTable):
            self.kind = "bit"
            if metric not in BIT_OPCLASSES:
                raise FeatureNotSupported(
                    f"operator {metric.op} is not supported by hnsw for bit vectors"
                )
            if table.dim > MAX_DIM_BIT:
                raise DataException(
                    f"column cannot have more than {MAX_DIM_BIT} dimensions for hnsw index"
                )
        elif isinstance(table, SparseTable):
            self.kind = "sparse"
            if metric not in SPARSE_OPCLASSES:
                raise FeatureNotSupported(
                    f"operator {metric.op} is not supported by hnsw for sparse vectors"
                )
            if table.nnz_cap > MAX_NNZ_SPARSE:
                raise DataException(
                    f"sparsevec cannot have more than {MAX_NNZ_SPARSE} non-zero elements for hnsw index"
                )
        else:
            raise FeatureNotSupported(f"hnsw does not support {type(table).__name__}")

        self._rng = np.random.default_rng(seed)
        # preallocating capacity avoids growth recompiles (every capacity
        # doubling gives the wave/query kernels new array shapes — ~10
        # extra compiles on a 1M build) and the attendant array copies.
        # Explicit capacities are honored to a 256-row multiple instead of
        # pow2-padded — the same policy as store/table._initial_cap, so the
        # element arrays match the table exactly (letting index values
        # alias the heap) and a 10M request allocates 10.0M element slots,
        # not 16.8M (+2.6 GB of graph arrays on a 16 GB chip).  Without an
        # explicit capacity the index sizes itself to the table's allocated
        # capacity: an index covers its whole heap, and growing from 1024
        # by doubling would copy every graph array ~10× on a 1M build and
        # transiently hold 2× the final footprint (the 10M OOM).
        if capacity:
            self._init_graph(capacity=max(-(-capacity // 256) * 256, 1024))
        else:
            self._init_graph(capacity=max(self._table_rows(), 1024))
        if build:
            self.build()

    # ------------------------------------------------------------- graph state
    def _derive_l_unroll(self, capacity: int) -> int:
        """Static upper-level unroll depth, derived from (capacity, m):
        levels are geometric with ratio 1/m (level = floor(-ln(U)·ml),
        ml = 1/ln(m), hnswutils.c:249), so the highest level any of
        ``capacity`` elements plausibly reaches is ~log_m(capacity) — the
        same bound the reference derives from page size (hnsw.h:133).
        Element levels are clamped to this; the clamp only binds with
        probability ~1/capacity.  PGVECTOR_TPU_L_UNROLL overrides."""
        import os

        env = os.environ.get("PGVECTOR_TPU_L_UNROLL")
        if env is not None:
            # clamp like the derived path: nbr_up/kept_up are statically
            # L_MAX deep, so a larger unroll would let levels alias the
            # top level's neighbor lists (gather clamping hides it)
            return min(L_MAX, max(1, int(env)))
        # highest level with ≥2 expected elements: E[count at L] = n·m^-L.
        # Every extra unroll level costs a full masked beam pass per wave
        # (measured 1313 vs 1830 rows/s at 1M for unroll 5 vs 4), so don't
        # pay for levels that hold ~one element.
        need = math.floor(
            math.log(max(capacity // 2, 2)) / math.log(self.m))
        return min(L_MAX, max(2, need))

    def _init_graph(self, capacity: int) -> None:
        if capacity > 2**30:
            # pool entries pack (id·2 | flag) into int32 and the dedup
            # sentinel is 0xFFFFFFFF (hnsw_kernels._hop_body) — ids must
            # stay below 2^30
            raise DataException(
                "hnsw index cannot hold more than 2^30 elements"
            )
        self._l_unroll = self._derive_l_unroll(capacity)
        t = self.table
        self.cap_e = capacity
        self.cap_u = max(capacity // max(self.m // 2, 1), 64)
        if self.kind == "dense":
            # halfvec parity: a 16-bit table's index stores 16-bit values
            # (the reference's halfvec opclasses index half-precision data,
            # src/hnsw.c opclass tables); scoring still accumulates in f32.
            # Halves index HBM for halfvec — 3.84 GB → 1.92 GB at 1M×960-d.
            self._val_dtype = (
                t.dtype if jnp.zeros((), t.dtype).dtype.itemsize == 2
                else jnp.float32
            )
        # The reference copies each vector into its index tuple
        # (HnswFormIndexValue, hnswutils.c:406-428).  Here the copy ALIASES
        # the heap arrays while the element↔row mapping is the identity and
        # values are stored unmodified — dense non-cosine (cosine stores
        # normalized copies), bit, and sparse all qualify.  The alias is
        # broken (one private gather) the first time an index-only rewrite
        # happens: vacuum zeroing, slot reuse after deletes, growth past the
        # table, dedup merges.  Saves a full table-sized copy of HBM on the
        # common build-once path (2.6 GB at 10M×128-d bf16).
        self._alias_values = (
            not (self.kind == "dense" and self.metric is Metric.COSINE)
            and (self.kind != "dense"
                 or jnp.zeros((), self._val_dtype).dtype == jnp.zeros((), t.dtype).dtype)
            and self._table_rows() >= capacity
        )
        if self._alias_values:
            self._refresh_alias()
        elif self.kind == "dense":
            self.values = (jnp.zeros((capacity, t.dim), self._val_dtype),)
        elif self.kind == "bit":
            self.values = (jnp.zeros((capacity, t.words), jnp.uint32),)
        else:
            self.values = (
                jnp.full((capacity, t.nnz_cap), int(D.SPARSE_PAD), jnp.int32),
                jnp.zeros((capacity, t.nnz_cap), jnp.float32),
            )
        self.nbr0 = jnp.full((capacity, 2 * self.m), -1, jnp.int32)
        # upper-level lists sized to the derived unroll depth, not the
        # L_MAX cap — 12 statically allocated levels would waste ~0.5 GB
        # at 10M when only ~6 are reachable
        self.nbr_up = jnp.full((self.cap_u, self._l_unroll, self.m), -1,
                               jnp.int32)
        # sticky heuristic-kept flags per neighbor slot (the reference's
        # cached ``closer`` bits, hnswutils.c:1094-1131) — protected from
        # backlink turnover; load-bearing for IP graph connectivity
        self.kept0 = jnp.zeros((capacity, 2 * self.m), jnp.bool_)
        self.kept_up = jnp.zeros((self.cap_u, self._l_unroll, self.m),
                                 jnp.bool_)
        self.up_slot = np.full(capacity, -1, np.int32)
        self.levels = np.full(capacity, -1, np.int32)
        self.elem_rows = np.full((capacity, HEAPTIDS), -1, np.int32)
        self.n_elems = 0
        self.n_upper = 0
        self.entry: int = -1
        self.entry_level: int = -1
        self.free_slots: List[int] = []
        self.row_to_elem: Dict[int, int] = {}
        self._dup_index: Dict[bytes, int] = {}
        self._up_slot_dev: Optional[jnp.ndarray] = None
        self._levels_dev: Optional[jnp.ndarray] = None
        self._elem_rows_dev: Optional[jnp.ndarray] = None
        self._dirty = True
        #: adjacency-packed neighbor values for the scan path (lazily
        #: built, invalidated by any graph mutation)
        self._nbr_vals: Optional[jnp.ndarray] = None
        #: cached (D, D') sketch projection for the projected packed scan
        self._sketch_P: Optional[jnp.ndarray] = None
        #: per-dim dequant scale + exact per-row dequantized norms of the
        #: int8 packed cache (set when that cache is built)
        self._nbr_scale: Optional[jnp.ndarray] = None
        self._nbr_norm2: Optional[jnp.ndarray] = None

    def _table_rows(self) -> int:
        t = self.table
        return int((t.data if self.kind != "sparse" else t.idx).shape[0])

    def _refresh_alias(self) -> None:
        """Re-point aliased index values at the table's CURRENT buffers.
        table.insert donates its old arrays to the append kernel, so a
        stale alias would read a deleted buffer."""
        if not getattr(self, "_alias_values", False):
            return
        t = self.table
        self.values = ((t.data,) if self.kind != "sparse" else (t.idx, t.val))

    def _materialize_values(self) -> None:
        """Break the table alias: gather every element its own value copy
        (by primary TID) so index-private rewrites — vacuum zeroing, slot
        reuse after deletes, growth padding — can't read through to rows
        the heap has since changed."""
        if not self._alias_values:
            return
        self._refresh_alias()
        rows = jnp.asarray(np.maximum(self.elem_rows[:, 0], 0), jnp.int32)
        live = jnp.asarray(self.elem_rows[:, 0] >= 0)
        fills = (int(D.SPARSE_PAD), 0) if self.kind == "sparse" else (0,)
        self.values = tuple(
            jnp.where(live[:, None], a[rows], jnp.asarray(f, a.dtype))
            for a, f in zip(self.values, fills)
        )
        self._alias_values = False

    def _ensure_unroll_depth(self, depth: int) -> None:
        """Widen the upper-level arrays to ``depth`` levels (allocation
        tracks the derived unroll, which can deepen on growth or when a
        checkpoint stores taller levels)."""
        depth = min(max(depth, self._l_unroll), L_MAX)
        self._l_unroll = depth
        width = self.nbr_up.shape[1]
        if width >= depth:
            return
        pad = depth - width
        self.nbr_up = jnp.concatenate(
            [self.nbr_up,
             jnp.full((self.cap_u, pad, self.m), -1, jnp.int32)], axis=1)
        self.kept_up = jnp.concatenate(
            [self.kept_up,
             jnp.zeros((self.cap_u, pad, self.m), jnp.bool_)], axis=1)

    def _sync_device_meta(self) -> None:
        self._refresh_alias()
        if self._dirty:
            self._up_slot_dev = jnp.asarray(self.up_slot)
            self._levels_dev = jnp.asarray(self.levels)
            self._elem_rows_dev = jnp.asarray(self.elem_rows)
            self._dirty = False

    # ----------------------------------------------------------- index values
    def _form_values(self, rows: np.ndarray) -> Tuple[tuple, np.ndarray]:
        """HnswFormIndexValue (hnswutils.c:406-428): fetch, check, and
        normalize (cosine) the rows' values.  Returns (value block pytree,
        keep mask) — zero-norm rows are not indexed for cosine
        (hnswutils.c:417-423)."""
        t = self.table
        r = jnp.asarray(rows)
        if self.kind == "dense":
            if self.metric is Metric.COSINE:
                vals = t.data[r].astype(jnp.float32)
                norms = jnp.sqrt(jnp.sum(vals * vals, axis=1, keepdims=True))
                keep = np.asarray(norms[:, 0] > 0)
                # normalize in f32, store in the index value dtype
                vals = (vals / jnp.maximum(norms, 1e-30)).astype(self._val_dtype)
                return (vals,), keep
            return (t.data[r].astype(self._val_dtype),), np.ones(len(rows), bool)
        if self.kind == "bit":
            return (t.data[r],), np.ones(len(rows), bool)
        return (t.idx[r], t.val[r]), np.ones(len(rows), bool)

    def _query_rep(self, q):
        """GetScanValue (hnswscan.c:92-114): coerce + normalize queries."""
        t = self.table
        if self.kind == "dense":
            from .flat import _coerce_dense_queries

            qs = _coerce_dense_queries(q, t.dim)
            if self.metric is Metric.COSINE:
                norms = jnp.sqrt(jnp.sum(qs * qs, axis=1, keepdims=True))
                qs = qs / jnp.maximum(norms, 1e-30)
            return qs, qs.shape[0]
        if self.kind == "bit":
            from ..types import Bit

            if isinstance(q, Bit):
                q = q.bits[None, :]
            elif isinstance(q, (list, tuple)) and q and isinstance(q[0], Bit):
                q = np.stack([b.bits for b in q])
            arr = np.asarray(q, dtype=bool)
            if arr.ndim == 1:
                arr = arr[None, :]
            if arr.shape[1] != t.dim:
                raise DataException(
                    f"different bit lengths {arr.shape[1]} and {t.dim}"
                )
            qw = D.pack_bits(jnp.asarray(arr))
            return qw, qw.shape[0]
        from ..types import SparseVec

        if isinstance(q, SparseVec):
            q = [q]
        pq = t.nnz_cap
        q_idx = np.full((len(q), pq), int(D.SPARSE_PAD), np.int32)
        q_val = np.zeros((len(q), pq), np.float32)
        for i, sv in enumerate(q):
            if sv.dim != t.dim:
                raise DataException(
                    f"different sparsevec dimensions {sv.dim} and {t.dim}"
                )
            q_idx[i, : sv.nnz] = sv.indices
            q_val[i, : sv.nnz] = sv.values
        return (jnp.asarray(q_idx), jnp.asarray(q_val)), len(q)

    def _elems_as_queries(self, elems: jnp.ndarray):
        """Use stored elements as the query side (for build searches)."""
        if self.kind == "sparse":
            return (self.values[0][elems], self.values[1][elems])
        return self.values[0][elems]

    # ------------------------------------------------------- neighbor closures
    def _neighbors_of_level(self, elems: jnp.ndarray, level: int) -> jnp.ndarray:
        """Gather a (Q,)-batch of elements' neighbor lists at ``level``."""
        safe = jnp.maximum(elems, 0)
        if level == 0:
            out = self.nbr0[safe]
        else:
            self._sync_device_meta()
            slot = self._up_slot_dev[safe]
            out = self.nbr_up[jnp.maximum(slot, 0), level - 1]
            out = jnp.where(slot[:, None] >= 0, out, -1)
        return jnp.where(elems[:, None] >= 0, out, -1)

    def _kept_of_level(self, elems: jnp.ndarray, level: int) -> jnp.ndarray:
        """Gather the sticky kept flags matching _neighbors_of_level."""
        safe = jnp.maximum(elems, 0)
        if level == 0:
            out = self.kept0[safe]
        else:
            self._sync_device_meta()
            slot = self._up_slot_dev[safe]
            out = self.kept_up[jnp.maximum(slot, 0), level - 1]
            out = jnp.where(slot[:, None] >= 0, out, False)
        return jnp.where(elems[:, None] >= 0, out, False)

    def _scorer(self):
        return K.make_scorer(self.kind, self.metric, self.values,
                             self._scorer_sdim())

    # ------------------------------------------------------------------ build
    def build(self) -> None:
        t = self.table
        # phases mirror hnswbuildphasename (hnsw.c:117-129)
        self.progress.set_phase("initializing")
        live = np.flatnonzero(np.asarray(t.valid[: t.count]))
        if len(live) == 0:
            return
        self.progress.set_phase("loading tuples", len(live))
        with timers.phase("hnsw.build"):
            self._insert_rows(live)
            # the fused wave loop has no host syncs — waves pipeline
            # asynchronously through the dispatch queue.  Block here so
            # build() returning means the graph is actually materialized
            # (and so wall-clock timings of build are honest).
            jax.block_until_ready((self.nbr0, self.nbr_up))

    def insert(self, rows) -> None:
        """aminsert analogue (hnswinsert.c:695-743) for a batch of new rows."""
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        self._insert_rows(rows)

    # ----------------------------------------------------- core insert driver
    def _insert_rows(self, rows: np.ndarray) -> None:
        self._refresh_alias()
        # alias fast path: without dedup (no host value keys needed) and
        # with values aliasing the heap, forming the value block would
        # gather a full row copy (2.6 GB at 10M×128-d) only for
        # _write_values to discard it — defer forming until a non-identity
        # mapping actually needs it
        lazy = self._alias_values and not self.dedup
        if lazy:
            values, keep = None, np.ones(len(rows), bool)
        else:
            values, keep = self._form_values(rows)
            rows = rows[keep]
            if not keep.all():
                values = jax.tree.map(
                    lambda a: a[jnp.asarray(np.flatnonzero(keep))], values)
        if len(rows) == 0:
            return

        # duplicate merge (InsertTupleInMemory duplicate path,
        # hnswbuild.c:342-364; FindDuplicateOnDisk hnswinsert.c:641-663):
        # duplicates against existing elements attach a heap TID; duplicates
        # within this batch group into one new element (max 10 TIDs each)
        new_rows: List[List[int]] = []  # rows per new element
        new_val_pos: List[int] = []
        new_keys: List[bytes] = []
        if self.dedup:
            host_vals = [np.asarray(v) for v in values]
            keys = _dup_keys(host_vals)
            batch_map: Dict[bytes, int] = {}
            for i, row in enumerate(rows):
                e = self._dup_index.get(keys[i])
                if e is not None and self._attach_tid(e, int(row)):
                    continue
                j = batch_map.get(keys[i])
                if j is not None and len(new_rows[j]) < HEAPTIDS:
                    new_rows[j].append(int(row))
                    continue
                batch_map[keys[i]] = len(new_rows)
                new_rows.append([int(row)])
                new_val_pos.append(i)
                new_keys.append(keys[i])
        else:
            new_rows = [[int(r)] for r in rows]
            new_val_pos = list(range(len(rows)))
            new_keys = [None] * len(rows)

        if not new_rows:
            return
        if new_val_pos != list(range(len(rows))):
            # only gather when dedup actually dropped/merged rows — the
            # identity gather would copy the full value block (3.8 GB at
            # 1M×960-d) for nothing
            sel = jnp.asarray(np.asarray(new_val_pos, np.int64))
            values = jax.tree.map(lambda a: a[sel], values)

        # allocate element slots + levels (vectorized bookkeeping; the only
        # remaining per-element loop is the multi-TID fill for duplicates)
        elems = np.asarray(self._alloc_slots(len(new_rows)), np.int64)
        lv = np.minimum(
            np.floor(-np.log(self._rng.random(len(new_rows))) * self.ml).astype(np.int32),
            self._l_unroll,
        )
        self.levels[elems] = lv
        self.elem_rows[elems, :] = -1
        lens = np.fromiter((len(g) for g in new_rows), np.int64, len(new_rows))
        if int(lens.max()) == 1:
            rows_flat = np.fromiter((g[0] for g in new_rows), np.int64, len(new_rows))
            self.elem_rows[elems, 0] = rows_flat
            self.row_to_elem.update(zip(rows_flat.tolist(), elems.tolist()))
        else:
            for j, e in enumerate(elems):
                for t, row in enumerate(new_rows[j]):
                    self.elem_rows[e, t] = row
                    self.row_to_elem[row] = int(e)
        if self.dedup:
            for j, key in enumerate(new_keys):
                self._dup_index[key] = int(elems[j])
        need_up = (lv >= 1) & (self.up_slot[elems] < 0)
        if need_up.any():
            self.up_slot[elems[need_up]] = self._alloc_upper_bulk(int(need_up.sum()))
        self._dirty = True
        self._nbr_vals = None  # graph is about to change
        if values is None:
            e_np = np.asarray(elems, np.int64)
            if np.array_equal(self.elem_rows[e_np, 0], e_np):
                self._refresh_alias()  # heap rows ARE these values
            elif self._alias_values:
                # non-identity mapping (slot reuse after deletes): one
                # private gather by TID covers every element, this batch
                # included — elem_rows for it was just written above
                self._materialize_values()
            else:
                # _grow() during _alloc_slots broke the alias mid-call:
                # the padded private copy holds table row e at slot e,
                # which is wrong for a non-identity elem↔row mapping —
                # write this batch's values explicitly (they'd otherwise
                # silently keep the grow-pad contents)
                vals, _ = self._form_values(self.elem_rows[e_np, 0]
                                            .astype(np.int64))
                self._write_values(elems, vals)
        else:
            self._write_values(elems, values)
            del values

        # wave schedule: full-size waves from the start — intra-wave
        # candidates interconnect each wave internally, so the geometric
        # warm-up the frozen-graph formulation needed is redundant (and
        # with fixed-shape padding each warm-up wave cost a full wave).
        # Wave size degrades to fit maintenance_work_mem (the reference's
        # memory-cliff behavior, hnswbuild.c:530-549: NOTICE + keep going
        # slower, instead of failing).
        wave_size = self._effective_wave_size()
        order = np.arange(len(elems))
        waves = [order[p: p + wave_size]
                 for p in range(0, len(order), wave_size)]
        # The wave loop dispatches asynchronously (no host syncs) — at 10M
        # rows that queues ~10k waves with zero observable progress and
        # near-zero host CPU for the device's whole multi-hour drain, which
        # defeats both operators and the wedge watchdog
        # (experiments/watchdog_run.py).  PGVECTOR_TPU_WAVE_SYNC_EVERY=N
        # blocks on the graph every N waves and logs progress to stderr;
        # the sync itself is one drain point per N waves (<0.1% overhead at
        # N>=32) and bounds the in-flight dispatch queue.
        sync_every = int(os.environ.get("PGVECTOR_TPU_WAVE_SYNC_EVERY", "0")
                         or 0)
        import sys as _sys
        import time as _time

        t_wave0 = _time.time()
        for wi, wave in enumerate(waves):
            with timers.phase("hnsw.wave"):
                self._insert_wave(np.asarray(elems)[wave], lv[wave])
            self.progress.advance(len(wave))
            if sync_every and (wi + 1) % sync_every == 0:
                jax.block_until_ready(self.nbr0)
                done = wi + 1
                rate = done / max(_time.time() - t_wave0, 1e-9)
                print(f"hnsw build: wave {done}/{len(waves)} "
                      f"({rate:.2f} waves/s, "
                      f"eta {(len(waves) - done) / max(rate, 1e-9):.0f}s)",
                      file=_sys.stderr, flush=True)

    def _wave_bytes(self, b: int) -> int:
        """Transient device bytes one insert wave of ``b`` elements needs:
        visited hash tables, beam pools, the lane-padded pairwise select
        block, and per-level output pools.  This is the TPU analogue of the
        reference's in-memory graph accounting (hnswAllocSize users,
        hnswbuild.c:530-549) — the persistent graph lives in HBM regardless;
        the budget governs the build's working set."""
        ef = self.ef_construction
        h = K.visited_capacity(ef)
        c = ef + min(self.m, b)  # beam pool + intra-wave candidates
        c = ((c + 127) // 128) * 128  # TPU lane padding (K._pad_lanes)
        if self.kind == "dense":
            rep = 4 * self.table.dim
            pair = 4 * c * c           # pairwise select block (one matmul)
        elif self.kind == "bit":
            rep = 4 * self.table.words
            pair = 4 * c * c           # popcount block fuses (measured at 1M)
        else:
            rep = 8 * self.table.nnz_cap
            if self._pair_sdim():
                # densified pairwise: (c, sdim) f32 scatter block + the
                # (c, c) matmul output (×2 covers scatter temps)
                pair = c * self.table.dim * 4 * 2 + 4 * c * c
            else:
                # the merge-join pairwise materializes (c, c, nnz_lanes)
                # idx+val gather temps per row — searchsorted gathers
                # defeat XLA fusion (measured 36.5 GB compile-OOM at
                # 2048 rows, nnz 32)
                pair = c * c * self._nnz_lanes() * 8
        per_q = (
            4 * h                      # visited table
            + pair                     # pairwise select block
            + (ef + c) * (rep + 9)     # pool vectors + dists + ids + flags
            + (self._l_unroll + 1) * ef * 8  # stacked per-level out pools
        )
        return b * per_q

    def _nnz_lanes(self) -> int:
        return ((self.table.nnz_cap + 127) // 128) * 128

    def _pair_sdim(self) -> int:
        """Logical dim to densify sparse pairwise-select blocks at, or 0
        for the merge-join path.  Densify (scatter CSR rows to dense
        (C, dim) lanes + one MXU matmul — K._pairwise_dists) when the
        dense row is smaller than the per-candidate merge-join gather
        temps: dim·4 < C·nnz_lanes·8.  At nnz 32, C 128 that's any
        dim < 32,768 — covering typical sparse embedding dims while
        million-dim sparsevecs keep the gather path.  L1 has no matmul
        form, so it always merge-joins."""
        if self.kind != "sparse" or self.metric is Metric.L1:
            return 0
        c = ((self.ef_construction + min(self.m, self.wave_size) + 127)
             // 128) * 128
        dim = int(self.table.dim)
        return dim if dim * 4 < c * self._nnz_lanes() * 8 else 0

    def _scorer_sdim(self) -> int:
        """Logical dim for the densified-query scorer (K.make_scorer), or 0
        for the merge-join scorer.  Unlike _pair_sdim (whose densified
        block scales with the candidate count C), the scorer's dense block
        is just (Q, dim+1) f32 — Q·dim·4 bytes regardless of hop width —
        so any moderate logical dim qualifies; million-dim sparsevecs keep
        the merge join.  Besides being strictly cheaper (gather vs binary
        search per stored entry), this keeps the searchsorted merge-join
        gather kernel — which hard-crashes this image's TPU worker at
        large shapes (BENCH_NOTES r5) — out of every search program.  L1
        needs the overlap mask and keeps the merge join."""
        if self.kind != "sparse" or self.metric is Metric.L1:
            return 0
        dim = int(self.table.dim)
        return dim if dim <= 32768 else 0

    def _sparse_pair_rows_cap(self) -> int:
        """Max rows per pairwise sparse select/merge call: the transients
        — (rows, C, sdim) densified blocks, or (rows, C, C, nnz_lanes)
        merge-join gather temps — must stay under
        ``hnsw.sparse_pair_bytes`` of HBM (default 2 GB; the
        PGVECTOR_TPU_SPARSE_PAIR_BYTES env var seeds the knob at
        import — see _wave_bytes)."""
        c = ((self.ef_construction + min(self.m, self.wave_size) + 127)
             // 128) * 128
        if self._pair_sdim():
            per_row = c * self.table.dim * 4 * 2 + 4 * c * c
        else:
            per_row = c * c * self._nnz_lanes() * 8
        # Bounded because the axon remote worker has died (hard process
        # crash, not RESOURCE_EXHAUSTED) on large merge-join gather temps —
        # a smaller bound trades dispatch count for headroom (BENCH_NOTES
        # round-3 sparse lane).
        bound = int(config.get("hnsw.sparse_pair_bytes"))
        cap = max(1, bound // per_row)
        p = 1
        while p * 2 <= cap:
            p *= 2
        return p

    def _effective_wave_size(self) -> int:
        """Shrink the wave until its working set fits maintenance_work_mem;
        NOTICE once per index when degraded (hnswbuild.c:538-543)."""
        budget = int(config.get("maintenance_work_mem"))
        wave = self.wave_size
        if self.kind == "sparse":
            # structural HBM bound, not a budget choice (so no work_mem
            # NOTICE): connect_level's full-wave pairwise select is
            # merge-join gathers for sparse
            wave = min(wave, self._sparse_pair_rows_cap())
        start = wave
        while wave > 8 and self._wave_bytes(wave) > budget:
            wave //= 2
        self._wave_eff = wave
        if wave < start and not self._mem_notice_fired:
            self._mem_notice_fired = True
            self.notice_hook(
                "hnsw build wave no longer fits into maintenance_work_mem\n"
                f"DETAIL:  Reduced insert wave size from {start} to "
                f"{wave}. Building will take significantly more time.\n"
                "HINT:  Increase maintenance_work_mem to speed up builds."
            )
        return wave

    def _attach_tid(self, elem: int, row: int) -> bool:
        """AddDuplicateOnDisk (hnswinsert.c:585-636): append a heap TID to
        an existing element, max 10."""
        if self.levels[elem] < 0:
            return False
        slots = self.elem_rows[elem]
        for j in range(HEAPTIDS):
            if slots[j] < 0:
                slots[j] = row
                self.row_to_elem[row] = elem
                self._dirty = True
                return True
        return False

    def _alloc_slots(self, n: int) -> List[int]:
        out = [self.free_slots.pop() for _ in range(min(len(self.free_slots), n))]
        rem = n - len(out)
        if rem:
            while self.n_elems + rem > self.cap_e:
                self._grow()
            out.extend(range(self.n_elems, self.n_elems + rem))
            self.n_elems += rem
        return out

    def _alloc_upper_bulk(self, n: int) -> np.ndarray:
        while self.n_upper + n > self.cap_u:
            new_cap = self.cap_u * 2
            width = self.nbr_up.shape[1]
            self.nbr_up = jnp.concatenate(
                [self.nbr_up,
                 jnp.full((new_cap - self.cap_u, width, self.m), -1,
                          jnp.int32)]
            )
            self.kept_up = jnp.concatenate(
                [self.kept_up,
                 jnp.zeros((new_cap - self.cap_u, width, self.m), jnp.bool_)]
            )
            self.cap_u = new_cap
        out = np.arange(self.n_upper, self.n_upper + n, dtype=np.int32)
        self.n_upper += n
        return out

    def _alloc_upper(self) -> int:
        return int(self._alloc_upper_bulk(1)[0])

    def _grow(self) -> None:
        new_cap = self.cap_e * 2
        if new_cap > 2**30:
            raise DataException(
                "hnsw index cannot hold more than 2^30 elements"
            )
        # deeper graphs earn a deeper unroll (never shrinks: existing
        # levels were clamped to the old depth and stay valid)
        self._ensure_unroll_depth(self._derive_l_unroll(new_cap))
        self._nbr_vals = None
        pad = new_cap - self.cap_e

        def grow_val(a, fill):
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]
            )

        # growth pads the value arrays past the table — the padded copy is
        # private from here on
        self._refresh_alias()
        self._alias_values = False
        if self.kind == "sparse":
            self.values = (
                grow_val(self.values[0], int(D.SPARSE_PAD)),
                grow_val(self.values[1], 0),
            )
        else:
            self.values = (grow_val(self.values[0], 0),)
        self.nbr0 = grow_val(self.nbr0, -1)
        self.kept0 = grow_val(self.kept0, False)
        self.up_slot = np.concatenate([self.up_slot, np.full(pad, -1, np.int32)])
        self.levels = np.concatenate([self.levels, np.full(pad, -1, np.int32)])
        self.elem_rows = np.concatenate(
            [self.elem_rows, np.full((pad, HEAPTIDS), -1, np.int32)]
        )
        self.cap_e = new_cap
        self._dirty = True

    def _write_values(self, elems: List[int], values: tuple) -> None:
        if self._alias_values:
            e_np = np.asarray(elems, np.int64)
            if np.array_equal(self.elem_rows[e_np, 0], e_np):
                # identity alias: the heap rows ARE these elements' values
                # (non-cosine, unmodified storage) — nothing to write
                self._refresh_alias()
                return
            self._materialize_values()
        e = jnp.asarray(np.asarray(elems, np.int32))
        self.values = tuple(
            arr.at[e].set(block) for arr, block in zip(self.values, values)
        )

    # ------------------------------------------------------------ wave insert
    def _search_wave_raw(self, elems: np.ndarray, lv: np.ndarray,
                         exclude_self: bool):
        """Batched Algorithm 1 via the jitted wave_search kernel.  Wave
        sizes are padded to powers of two so jit caches stay small.
        Returns the stacked padded per-level pools (L+1, nq_pad, ef)."""
        self._sync_device_meta()
        nq = len(elems)
        # pad every wave to the fixed wave_size so one compiled shape serves
        # the whole build (warmup waves waste some compute, not compiles)
        nq_pad = min(_round_pow2(max(nq, 8)), _round_pow2(self.wave_size))
        if nq_pad < nq:
            nq_pad = _round_pow2(nq)
        e_pad = np.concatenate([elems, np.full(nq_pad - nq, elems[0], elems.dtype)])
        lv_pad = np.concatenate([lv, np.zeros(nq_pad - nq, lv.dtype)])
        qs = self._elems_as_queries(jnp.asarray(e_pad.astype(np.int32)))
        mesh = self.build_mesh
        if (mesh is not None and len(mesh.devices.flat) > 1
                and nq_pad % len(mesh.devices.flat) == 0
                and not K.use_host_loop()):
            out_d, out_i = K.wave_search_sharded(
                mesh, self.kind, self.metric, self.values,
                self.nbr0, self.nbr_up, self._up_slot_dev,
                qs, jnp.asarray(e_pad.astype(np.int32)),
                jnp.asarray(lv_pad.astype(np.int32)),
                jnp.int32(self.entry), jnp.int32(self.entry_level),
                ef=self.ef_construction, m=self.m,
                l_unroll=self._l_unroll, exclude_self=exclude_self,
                expand=self.beam_expand, vmode=K.visited_mode(),
                sdim=self._scorer_sdim(),
            )
            return out_d, out_i, nq, nq_pad
        wave_fn = K.wave_search_host if K.use_host_loop() else K.wave_search
        out_d, out_i = wave_fn(
            self.kind, self.metric, self.values,
            self.nbr0, self.nbr_up, self._up_slot_dev,
            qs, jnp.asarray(e_pad.astype(np.int32)), jnp.asarray(lv_pad.astype(np.int32)),
            jnp.int32(self.entry), jnp.int32(self.entry_level),
            ef=self.ef_construction, m=self.m,
            l_unroll=self._l_unroll, exclude_self=exclude_self,
            expand=self.beam_expand, vmode=K.visited_mode(),
            sdim=self._scorer_sdim(),
        )
        return out_d, out_i, nq, nq_pad

    def _search_wave(self, elems: np.ndarray, lv: np.ndarray, exclude_self: bool):
        out_d, out_i, nq, _ = self._search_wave_raw(elems, lv, exclude_self)
        pools = {}
        for lc in range(min(self.entry_level, int(lv.max())), -1, -1):
            pools[lc] = (out_d[lc, :nq], out_i[lc, :nq])
        return pools

    def _insert_wave_fused(self, elems: np.ndarray, lv: np.ndarray,
                           exclude_self: bool) -> None:
        """Search + connect with the fused per-level connect kernel
        (K.connect_level): ~3 device dispatches per wave instead of dozens
        of host round-trips (each a tunnel-latency stall on the remote-TPU
        image — BENCH_NOTES.md).

        Phase timers here bracket ASYNC dispatches — device time lands in
        whichever phase next blocks.  PGVECTOR_TPU_PHASE_SYNC=1 (with
        timers enabled) adds a block_until_ready at each phase boundary so
        the search/connect split is attributed honestly; bench.py uses it
        on a short profiling build to project the multi-chip build time
        (wave search being the mesh-parallel term — wave_search_sharded)."""
        sync = timers.enabled and os.environ.get(
            "PGVECTOR_TPU_PHASE_SYNC", "0") == "1"
        with timers.phase("hnsw.wave.search"):
            out_d, out_i, nq, nq_pad = self._search_wave_raw(
                elems, lv, exclude_self)
            if sync:
                jax.block_until_ready((out_d, out_i))
        with timers.phase("hnsw.wave.connect"):
            e_conn = jnp.asarray(np.concatenate(
                [elems, np.full(nq_pad - nq, -1, elems.dtype)]
            ).astype(np.int32))
            lv_conn = np.concatenate(
                [lv, np.full(nq_pad - nq, -1, lv.dtype)])
            top = min(self.entry_level, int(lv.max()))
            for lc in range(top, -1, -1):
                elig = lv >= lc
                if not elig.any():
                    continue
                lm = 2 * self.m if lc == 0 else self.m
                if lc == 0:
                    e_lvl, elig_dev = e_conn, jnp.asarray(lv_conn >= 0)
                    pd, pi = out_d[0], out_i[0]
                    b_lvl = nq_pad
                else:
                    # upper levels hold ~1/m of the wave — compact to a
                    # small block instead of paying a full-wave connect
                    # (a 1024-row select costs the same whether 64 or
                    # 1024 rows are real).  The 64-row floor must not
                    # exceed the sparse pairwise clamp: connect_level's
                    # select runs over ALL b_lvl rows in one call.
                    floor = 64
                    if self.kind == "sparse":
                        floor = min(floor, self._sparse_pair_rows_cap())
                    idx_e = np.flatnonzero(elig)
                    b_lvl = _round_pow2(max(len(idx_e), floor))
                    pad_e = b_lvl - len(idx_e)
                    sel_idx = jnp.asarray(np.concatenate(
                        [idx_e, np.zeros(pad_e, idx_e.dtype)]))
                    e_lvl = jnp.asarray(np.concatenate(
                        [elems[idx_e], np.full(pad_e, -1, elems.dtype)]
                    ).astype(np.int32))
                    elig_dev = jnp.asarray(
                        np.arange(b_lvl) < len(idx_e))
                    pd = out_d[lc][sel_idx]
                    pi = out_i[lc][sel_idx]
                # 2048-row merge chunks amortize the sequential select
                # fori_loop (the per-chunk fixed cost measured ~11ms at
                # 1024 rows on v5e; bigger chunks halve invocations).
                # Sparse merge rows pay the same pairwise gather temps as
                # the wave select — same structural cap.
                chunk = min(2048, _round_pow2(b_lvl * lm))
                if self.kind == "sparse":
                    chunk = min(chunk, self._sparse_pair_rows_cap())
                mesh = self.build_mesh
                ndev = len(mesh.devices.flat) if mesh is not None else 1
                if (mesh is not None and ndev > 1 and b_lvl % ndev == 0
                        and b_lvl >= ndev and not K.use_host_loop()):
                    # mesh-parallel connect: the select pairwise and the
                    # backlink merge chunks split over the devices — with
                    # wave_search_sharded this makes BOTH build phases
                    # data-parallel (the measured phase split has connect
                    # ≥ search at 1M, so sharding only the search capped
                    # the v5e-8 projection at ~1.4×)
                    (self.nbr0, self.nbr_up, self.kept0, self.kept_up) = \
                        K.connect_level_sharded(
                            mesh, self.kind, self.metric, self.values,
                            self.nbr0, self.nbr_up, self.kept0, self.kept_up,
                            self._up_slot_dev, e_lvl, elig_dev, jnp.int32(lc),
                            pd, pi,
                            level0=(lc == 0), m=self.m,
                            mi=min(self.m, b_lvl), smax=lm, chunk=chunk,
                            sdim=self._pair_sdim(),
                        )
                    continue
                (self.nbr0, self.nbr_up, self.kept0, self.kept_up) = \
                    K.connect_level(
                        self.kind, self.metric, self.values,
                        self.nbr0, self.nbr_up, self.kept0, self.kept_up,
                        self._up_slot_dev, e_lvl, elig_dev, jnp.int32(lc),
                        pd, pi,
                        level0=(lc == 0), m=self.m,
                        mi=min(self.m, b_lvl), smax=lm, chunk=chunk,
                        sdim=self._pair_sdim(),
                    )
            if sync:
                jax.block_until_ready(self.nbr0)

    def _insert_wave(self, elems: np.ndarray, lv: np.ndarray) -> None:
        """One wave: batched search + neighbor selection + connection
        writes (the InsertTupleInMemory/UpdateGraphInMemory path,
        hnswbuild.c:437-480, without the per-element LWLocks)."""
        if self.entry < 0:
            # first element becomes the entry point with no neighbors
            self.entry = int(elems[0])
            self.entry_level = int(lv[0])
            elems, lv = elems[1:], lv[1:]
            if len(elems) == 0:
                return
        if self.backlink_mode == "incremental":
            with timers.phase("hnsw.wave.search"):
                pools = self._search_wave(elems, lv, exclude_self=False)
            with timers.phase("hnsw.wave.connect"):
                self._connect_from_pools(elems, lv, pools)
        else:
            self._insert_wave_fused(elems, lv, exclude_self=False)
        # entry point update (the entryLock handshake, hnswbuild.c:437-480)
        wave_max = int(lv.max()) if len(lv) else -1
        if wave_max > self.entry_level:
            j = int(np.argmax(lv))
            self.entry = int(elems[j])
            self.entry_level = wave_max

    def _connect_from_pools(self, elems: np.ndarray, lv: np.ndarray, pools) -> None:
        e_dev = jnp.asarray(elems.astype(np.int32))
        for lc in sorted(pools.keys(), reverse=True):
            lm = 2 * self.m if lc == 0 else self.m
            mask_q = lv >= lc
            if not mask_q.any():
                continue
            q_sel = np.flatnonzero(mask_q)
            pd, pi = pools[lc]
            # intra-wave candidates: wave members are invisible to each
            # other's frozen-graph searches; fold the nearest wave-mates at
            # this level into the pools (sequential-insert information flow)
            if len(elems) > 1:
                intra_d, intra_i = K.intra_wave_candidates(
                    self.kind, self.metric, self.values, e_dev,
                    jnp.asarray(lv >= lc), min(self.m, len(elems)),
                    sdim=self._pair_sdim(),
                )
                pd = jnp.concatenate([pd, intra_d], axis=1)
                pi = jnp.concatenate([pi, intra_i], axis=1)
            # fixed block size → one compiled select shape per lm
            block = _round_pow2(self._wave_eff)
            for start in range(0, len(q_sel), block):
                chunk = q_sel[start: start + block]
                pad = block - len(chunk)
                idx_dev = jnp.asarray(np.concatenate(
                    [chunk, np.zeros(pad, chunk.dtype)]).astype(np.int64))
                pd_c = pd[idx_dev]
                pi_c = pi[idx_dev]
                if pad:
                    mask = jnp.arange(block) < len(chunk)
                    pi_c = jnp.where(mask[:, None], pi_c, -1)
                    pd_c = jnp.where(mask[:, None], pd_c, jnp.inf)
                base = np.concatenate(
                    [elems[chunk], np.full(pad, -1, elems.dtype)])
                with timers.phase("hnsw.wave.select"):
                    sel_elems, sel_kept = self._select_for(
                        jnp.asarray(base.astype(np.int32)), pd_c, pi_c, lm
                    )
                    sel_elems = sel_elems[: len(chunk)]
                    sel_kept = sel_kept[: len(chunk)]
                    self._write_own_lists(elems[chunk], lc, sel_elems, sel_kept)
                with timers.phase("hnsw.wave.sel_sync"):
                    sel_host = np.asarray(sel_elems)
                with timers.phase("hnsw.wave.backlink"):
                    self._apply_backlinks(elems[chunk], lc, sel_host, lm)

    def _select_for(self, base_elems, pool_d, pool_i, lm: int) -> jnp.ndarray:
        """SelectNeighbors over each base element's candidate pool."""
        return K.select_connections(
            self.kind, self.metric, self.values, base_elems, pool_d, pool_i,
            lm, sdim=self._pair_sdim(),
        )

    def _write_own_lists(self, elems: np.ndarray, level: int,
                         sel: jnp.ndarray, kept: jnp.ndarray) -> None:
        e = jnp.asarray(elems.astype(np.int32))
        if level == 0:
            self.nbr0 = self.nbr0.at[e].set(sel)
            self.kept0 = self.kept0.at[e].set(kept)
        else:
            slots = jnp.asarray(self.up_slot[elems])
            self.nbr_up = self.nbr_up.at[slots, level - 1].set(sel)
            self.kept_up = self.kept_up.at[slots, level - 1].set(kept)

    def _apply_backlinks(
        self, src_elems: np.ndarray, level: int, sel: np.ndarray, lm: int
    ) -> None:
        """HnswUpdateConnection for every (new element → neighbor) edge:
        group by target, then one select per target over old ∪ new
        (hnswutils.c:1181-1229).  Grouping is one stable argsort over the
        flattened edge list (no per-pair Python); target/source counts are
        padded to powers of two to bound jit variants."""
        flat_t = np.asarray(sel).reshape(-1)
        flat_s = np.repeat(src_elems.astype(np.int32), sel.shape[1])
        mask = flat_t >= 0
        if not mask.any():
            return
        order = np.argsort(flat_t[mask], kind="stable")
        ts = flat_t[mask][order]
        ss = flat_s[mask][order]
        uniq, starts, counts = np.unique(ts, return_index=True, return_counts=True)
        SMAX = 8  # new sources folded per round; overflow runs extra rounds
        offs = np.arange(SMAX)
        rnd = 0
        while True:
            has = counts > rnd * SMAX
            if not has.any():
                break
            t_r = uniq[has].astype(np.int32)
            st = starts[has] + rnd * SMAX
            n_r = np.minimum(counts[has] - rnd * SMAX, SMAX)
            idx = st[:, None] + offs[None, :]
            ok = offs[None, :] < n_r[:, None]
            new_src = np.where(ok, ss[np.minimum(idx, len(ss) - 1)], -1).astype(np.int32)
            self._backlink_round(t_r, new_src, level, lm, SMAX)
            rnd += 1

    def _backlink_round(self, targets: np.ndarray, src_mat: np.ndarray,
                        level: int, lm: int, smax: int) -> None:
        # fixed block size → one compiled backlink-merge shape per lm
        block = _round_pow2(max(self._wave_eff, 1))
        for start in range(0, len(targets), block):
            t_chunk = targets[start: start + block]
            pad = block - len(t_chunk)
            new_src = np.concatenate(
                [src_mat[start: start + block],
                 np.full((pad, smax), -1, np.int32)])
            t_full = np.concatenate([t_chunk, np.full(pad, -1, np.int32)])
            t_dev = jnp.asarray(t_full)
            old = self._neighbors_of_level(t_dev, level)  # (T, lm)
            old_kept = self._kept_of_level(t_dev, level)
            merge = (K.merge_backlinks if self.backlink_mode == "incremental"
                     else K.merge_backlinks_wholesale)
            new_lists, new_kept = merge(
                self.kind, self.metric, self.values, old, old_kept,
                jnp.asarray(new_src), t_dev, lm, sdim=self._pair_sdim(),
            )
            real = jnp.asarray(t_chunk)
            new_real = new_lists[: len(t_chunk)]
            kept_real = new_kept[: len(t_chunk)]
            if level == 0:
                self.nbr0 = self.nbr0.at[real].set(new_real)
                self.kept0 = self.kept0.at[real].set(kept_real)
            else:
                slots = jnp.asarray(self.up_slot[t_chunk])
                self.nbr_up = self.nbr_up.at[slots, level - 1].set(new_real)
                self.kept_up = self.kept_up.at[slots, level - 1].set(kept_real)

    # ------------------------------------------------------------------ search
    def search(
        self,
        q,
        k: int,
        ef_search: Optional[int] = None,
        filter_mask: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Algorithm 5 scan (hnswscan.c).  Returns (operator distances,
        row ids), -1/inf padded.  Without iterative scans the result count
        is capped at ef_search (README.md:933-935); with
        ``hnsw.iterative_scan`` on, exhausted searches RESUME from the best
        discarded candidates with a persistent visited set
        (ResumeScanItems, hnswscan.c:61-87) until k results pass the filter,
        ``hnsw.max_scan_tuples`` is reached, or the memory cap binds."""
        ef = int(
            config.validate("hnsw.ef_search", ef_search)
            if ef_search is not None
            else config.get("hnsw.ef_search")
        )
        mode = config.get("hnsw.iterative_scan")
        qs, nq = self._query_rep(q)

        if self.entry < 0:
            return (np.full((nq, k), np.inf, np.float32), np.full((nq, k), -1, np.int64))

        fmask = jnp.asarray(filter_mask, dtype=bool) if filter_mask is not None else None
        if mode == "off":
            d, r = self._search_once(qs, nq, k, ef, fmask)
            # one blocking fetch for both outputs: two sequential
            # np.asarray calls pay the device round-trip latency twice,
            # which dominated batch-1 p50 through the remote tunnel
            d, r = jax.device_get((d, r))
            self.stats.count(nq, r)
            return d, r
        d, r = self._search_iterative(qs, nq, k, ef, fmask, mode)
        self.stats.count(nq, r, rounds=self._last_scan_rounds)
        return d, r

    def _scan_bytes_per_query(self, ef: int) -> int:
        """Device bytes of per-query scan state at a given ef: pool slots ×
        (vector copy + distance + id + expanded flag) plus the visited hash
        table — the allocation that OOMs first at scale."""
        if self.kind == "sparse":
            vec_bytes = 4 * 2 * self.table.nnz_cap
        elif self.kind == "bit":
            vec_bytes = 4 * self.table.words  # packed uint32, not per-dim
        else:
            vec_bytes = 4 * self.table.dim
        pool_bytes = ef * (vec_bytes + 9)
        return pool_bytes + 4 * K.visited_capacity(ef)

    def _packed_dtype(self):
        """Scan-path value packing dtype (see _packed_plan)."""
        return self._packed_plan()[0]

    def _packed_plan(self):
        """Scan-path value packing plan: (dtype | None, sketch_dim).

        PGVECTOR_TPU_PACKED_SCAN: auto/off/f32/bf16/int8/sketch.  ``auto``
        packs dense indexes on TPU when the duplicated (cap, 2m, D) copy
        fits a conservative HBM budget — f32 when small enough (bit-exact
        vs the row-gather path), bf16 at 1M×128-d scale (≤8 GB; exact f32
        re-rank restores final ordering), then **int8** with a per-dim
        scale dequantized in-kernel (half bf16's bytes, ≤0.4%-of-range
        per-element error — GIST-960d at 200k is 6.1 GB here).  Beyond
        that (e.g. 1M×960-d needs 61 GB f32 / 15 GB int8 — over a v5e's
        16 GB), ``auto`` keeps the exact row-gather path (measured
        strictly better than the sketch there — see the inline note).
        ``sketch`` (explicit only) is a JL cache: neighbor values
        randomly projected D→D' (PGVECTOR_TPU_SKETCH_DIM, default the
        largest 128-multiple whose bf16 cache fits the budget) so hops
        ride contiguous slab gathers; sketch scores prune each hop
        (PGVECTOR_TPU_SKETCH_PRUNE) and exact gathers re-score survivors.
        sketch_dim == 0 means the cache holds full-width values."""
        import os

        mode = os.environ.get("PGVECTOR_TPU_PACKED_SCAN", "auto")
        if mode == "off" or self.kind != "dense":
            # only dense rows can be value-packed: bit tables store packed
            # uint32 words and sparse tables (idx, val) pairs — forcing the
            # mode on those would feed the wrong layout to the dense scorer
            return None, 0
        if mode in ("f32", "bf16", "int8"):
            return {"f32": jnp.float32, "bf16": jnp.bfloat16,
                    "int8": jnp.int8}[mode], 0
        if mode == "sketch":
            return jnp.bfloat16, self._sketch_dim()
        if jax.default_backend() != "tpu":
            return None, 0
        f32_bytes = self.cap_e * 2 * self.m * self.table.dim * 4
        if f32_bytes <= 2 << 30:
            return jnp.float32, 0
        if f32_bytes // 2 <= 9 << 30:
            return jnp.bfloat16, 0
        if (f32_bytes // 4 <= 9 << 30
                and self.metric in (Metric.L2, Metric.IP, Metric.COSINE)):
            # int8 needs the dot-form scorer (L1 would re-materialize an
            # f32 slab — the thing this tier exists to avoid)
            return jnp.int8, 0
        # beyond int8 the remaining slab option is the JL sketch, and it
        # measured strictly worse than plain row gathers at 1M×960-d on
        # v5e (hybrid sketch128+prune64: 0.7834 @ 2,154 qps vs row-gather
        # 0.9036 @ 2,122 — the scan there is hop-fixed-cost-bound, not
        # gather-bound, so pruning gathers buys no qps and loses recall).
        # Keep auto on the exact row-gather path; sketch stays an explicit
        # opt-in (PGVECTOR_TPU_PACKED_SCAN=sketch) for workloads whose
        # sketch top-``prune`` quality is better than this surrogate's.
        return None, 0

    def _sketch_dim(self) -> int:
        """Sketch width D' for the projected packed cache: explicit
        PGVECTOR_TPU_SKETCH_DIM, else the largest 128-multiple whose
        (cap, 2m, D') bf16 cache stays ≤ 9 GB; 0 when even 128 doesn't
        fit or wouldn't compress (D' ≥ D)."""
        import os

        explicit = int(os.environ.get("PGVECTOR_TPU_SKETCH_DIM", 0))
        if explicit:
            return explicit
        per_dim = self.cap_e * 2 * self.m * 2  # bf16 bytes per sketch dim
        sk = ((9 << 30) // per_dim) // 128 * 128
        sk = min(sk, 256)  # diminishing recall returns past 256 lanes
        return sk if 0 < sk < self.table.dim else 0

    def _sketch_proj(self, sk: int) -> jnp.ndarray:
        """Deterministic (D, D') Gaussian projection, scaled so sketched
        L2/IP are unbiased estimates of the full-width values (JL)."""
        if self._sketch_P is None or self._sketch_P.shape[1] != sk:
            rng = np.random.default_rng(0x5EEDC0DE)
            p = rng.normal(size=(self.table.dim, sk)).astype(np.float32)
            self._sketch_P = jnp.asarray(p / np.sqrt(sk))
        return self._sketch_P

    def _ensure_nbr_vals(self, dtype, sketch: int = 0):
        """Materialize nbr_vals[cap, 2m, D'] = values'[nbr0] — each
        element's neighbor value block as one contiguous slab (the scan
        then gathers Q·expand slabs per hop instead of Q·expand·2m random
        rows).  ``sketch`` > 0 projects values D→D' first (_sketch_proj).
        One chunked gather pass; rebuilt lazily after graph mutations."""
        if (self._nbr_vals is not None and self._nbr_vals.dtype == dtype
                and self._nbr_vals.shape[-1] == (sketch or self.table.dim)):
            return self._nbr_vals
        vecs = self.values[0]
        if sketch:
            p = self._sketch_proj(sketch)
            vecs = jnp.concatenate(
                [vecs[s: s + (1 << 18)].astype(jnp.float32) @ p
                 for s in range(0, vecs.shape[0], 1 << 18)]).astype(dtype)
        elif dtype == jnp.int8:
            # symmetric per-dim quantization; the hop kernel scores the
            # slab via an int8×int8→int32 MXU dot against the scale-folded
            # re-quantized query plus these exact dequantized-row norms
            # (K._int8_point_scores), so scores stay true f32 distance
            # estimates and the exact re-rank restores final ordering
            scale = jnp.maximum(
                jnp.max(jnp.abs(vecs.astype(jnp.float32)), axis=0), 1e-30
            ) / 127.0
            self._nbr_scale = scale
            qchunks = []
            nchunks = []
            for s in range(0, vecs.shape[0], 1 << 18):
                q8 = jnp.clip(jnp.round(
                    vecs[s: s + (1 << 18)].astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)
                qchunks.append(q8)
                nchunks.append(jnp.sum(
                    jnp.square(q8.astype(jnp.float32) * scale), axis=1))
            vecs = jnp.concatenate(qchunks)
            self._nbr_norm2 = jnp.concatenate(nchunks)
        chunk = min(1 << 16, self.cap_e)
        # fill a donated buffer chunk-by-chunk: the packed copy is up to
        # ~8 GB at 1M×128-d — concatenation would transiently double it
        out = jnp.zeros((self.cap_e, 2 * self.m, sketch or self.table.dim),
                        dtype)
        for s in range(0, self.cap_e, chunk):
            nb = jax.lax.dynamic_slice(
                self.nbr0, (s, 0), (min(chunk, self.cap_e - s),
                                    self.nbr0.shape[1]))
            out = _fill_nbr_vals(out, vecs, nb, s)
        self._nbr_vals = out
        return self._nbr_vals

    def _search_once(self, qs, nq: int, k: int, ef: int, fmask):
        self._sync_device_meta()
        # fmask stays None for unfiltered scans — the kernel skips the mask
        # gather and the host never dispatches an eager ones(capacity) fill
        pdt, sketch = self._packed_plan()
        packed_vals = (self._ensure_nbr_vals(pdt, sketch)
                       if pdt is not None else None)
        qs_packed = None
        if packed_vals is not None and sketch:
            qs_packed = (qs.astype(jnp.float32)
                         @ self._sketch_proj(sketch)).astype(pdt)
        is_int8 = packed_vals is not None and pdt == jnp.int8
        packed_scale = self._nbr_scale if is_int8 else None
        packed_norm2 = self._nbr_norm2 if is_int8 else None
        # hybrid two-level hop for sketched caches: sketch scores prune the
        # hop's candidates, exact row gathers re-score the survivors before
        # pool admission (K._hop_body).  0 disables (sketch-only admission).
        prune = 0
        if packed_vals is not None and sketch:
            prune = int(__import__("os").environ.get(
                "PGVECTOR_TPU_SKETCH_PRUNE", 64))
        query_fn = K.query_search_host if K.use_host_loop() else K.query_search
        d, r, steps, packed_back = query_fn(
            self.kind, self.metric, self.values,
            self.nbr0, self.nbr_up, self._up_slot_dev,
            self._elem_rows_dev,
            self.table.valid, fmask, qs, jnp.int32(self.entry),
            jnp.int32(self.entry_level),
            ef=ef, m=self.m, l_unroll=self._l_unroll, k=k,
            heaptids=HEAPTIDS, expand=self.beam_expand,
            vmode=K.visited_mode(),
            packed_vals=packed_vals,
            qs_packed=qs_packed,
            packed_scale=packed_scale,
            packed_norm2=packed_norm2,
            prune=prune,
            rerank=(pdt is not None and (pdt != jnp.float32 or sketch > 0)),
            # experimental straggler cap: bound layer-0 hops (recall trade)
            max_steps=int(__import__("os").environ.get(
                "PGVECTOR_TPU_QUERY_MAX_STEPS", 0)),
            pallas_tail=(pdt is not None and K.use_pallas_tail()
                         and K.visited_mode() == "off"),
            user_dist=True,  # stored→operator transform folded into the jit
            sdim=self._scorer_sdim(),
        )
        if packed_vals is not None:
            # the kernel DONATES the packed cache and returns it aliased
            # (no copy) — rebind so the next search reuses the same buffer
            self._nbr_vals = packed_back
        #: layer-0 hop count of the last scan — telemetry for bandwidth
        #: accounting (bench.py); a device scalar until read
        self._last_scan_steps = steps
        return d, r

    def _search_iterative(self, qs, nq: int, k: int, ef: int, fmask, mode: str):
        """Iterative scan driver: first search keeps a discarded pool; each
        resume re-seeds layer 0 from it with the visited set intact
        (hnswscan.c:61-87).  ``strict_order`` suppresses results whose
        distance regressed below an already-emitted batch's maximum
        (the previousDistance filter, hnswscan.c:313-319); relaxed keeps
        them.  Stops at hnsw.max_scan_tuples or the work_mem ×
        scan_mem_multiplier memory cap (hnswscan.c:149-156, 255-266)."""
        self._sync_device_meta()
        max_tuples = int(config.get("hnsw.max_scan_tuples"))
        mem_budget = (config.get("work_mem")
                      * config.get("hnsw.scan_mem_multiplier"))
        fm = fmask  # None = unfiltered; _expand_topk skips the mask gather
        dk = max(4 * ef, 64)
        pool_d, pool_i, visited, disc_d, disc_i, sc_dev = K.query_search_first(
            self.kind, self.metric, self.values, self.nbr0, self.nbr_up,
            self._up_slot_dev, qs, jnp.int32(self.entry),
            jnp.int32(self.entry_level), ef=ef, m=self.m,
            l_unroll=self._l_unroll, dk=dk, expand=self.beam_expand,
            sdim=self._scorer_sdim(),
        )
        acc_d: List[np.ndarray] = []
        acc_r: List[np.ndarray] = []
        prev_max = np.full(nq, -np.inf, np.float32)
        scanned = np.zeros(nq, np.int64)
        batches = 0
        while True:
            batches += 1
            d_dev, r_dev = K._expand_topk_jit(
                pool_d, pool_i, self._elem_rows_dev, self.table.valid, fm,
                ef, HEAPTIDS,
            )
            d = np.asarray(self._user_dist(d_dev))
            r = np.asarray(r_dev)
            # meter every scored candidate (the so->tuples contract of
            # hnsw.max_scan_tuples, hnswscan.c:255-266), not pool occupancy
            scanned += np.asarray(sc_dev, dtype=np.int64)
            if mode == "strict_order" and batches > 1:
                # suppress regressions below what earlier batches emitted
                bad = d < prev_max[:, None]
                d = np.where(bad, np.inf, d)
                r = np.where(bad, -1, r)
            finite = np.isfinite(d)
            batch_max = np.where(finite.any(axis=1),
                                 np.max(np.where(finite, d, -np.inf), axis=1),
                                 prev_max)
            prev_max = np.maximum(prev_max, batch_max.astype(np.float32))
            acc_d.append(d)
            acc_r.append(r)
            found = _count_found(acc_r, nq)
            disc_live = ~np.all(np.isinf(np.asarray(disc_d)), axis=1)
            active = (found < k) & (scanned < max_tuples) & disc_live
            state_bytes = (self._scan_bytes_per_query(ef)
                           + 4 * dk + batches * ef * 16)
            if not active.any() or state_bytes > mem_budget or batches >= 64:
                # the reference's "Return remaining tuples" branch
                # (hnswscan.c:258-266): when the tuple/memory cap binds with
                # fewer than k results, keep emitting from the discarded
                # pool (already distance-sorted) instead of dropping it
                if ((found < k) & disc_live).any():
                    dd_dev, dr_dev = K._expand_topk_jit(
                        disc_d, disc_i, self._elem_rows_dev,
                        self.table.valid, fm, min(dk, 4 * ef), HEAPTIDS,
                    )
                    dd = np.asarray(self._user_dist(dd_dev))
                    dr = np.asarray(dr_dev)
                    if mode == "strict_order":
                        bad = dd < prev_max[:, None]
                        dd = np.where(bad, np.inf, dd)
                        dr = np.where(bad, -1, dr)
                    acc_d.append(dd)
                    acc_r.append(dr)
                break
            pool_d, pool_i, visited, disc_d, disc_i, sc_dev = \
                K.query_search_resume(
                    self.kind, self.metric, self.values, self.nbr0,
                    self.nbr_up, self._up_slot_dev, qs, visited, disc_d,
                    disc_i, ef=ef, m=self.m, expand=self.beam_expand,
                    sdim=self._scorer_sdim(),
                )
        #: iterative resume rounds of the last scan — stats.searches input
        self._last_scan_rounds = batches
        # merge batches on device: dedup (duplicate emissions carry
        # identical distances), sort by distance, take k — one jitted call
        # for the whole query batch, no per-query host work
        all_d = np.concatenate(acc_d, axis=1)
        all_r = np.concatenate(acc_r, axis=1)
        kc = min(k, all_r.shape[1])
        m_d, m_r = K.merge_scan_batches(
            jnp.asarray(all_d, jnp.float32), jnp.asarray(all_r), kc)
        out_d = np.full((nq, k), np.inf, np.float32)
        out_r = np.full((nq, k), -1, np.int64)
        out_d[:, :kc] = np.asarray(m_d)
        out_r[:, :kc] = np.asarray(m_r)
        return out_d, out_r

    def _user_dist(self, stored: jnp.ndarray) -> jnp.ndarray:
        from ..ops.metric import stored_to_user

        return stored_to_user(self.metric, stored)

    # ------------------------------------------------------------------ vacuum
    def vacuum(self) -> None:
        """hnswbulkdelete's 4 passes (hnswvacuum.c:777-797), wave-batched."""
        self._nbr_vals = None  # repair rewrites neighbor lists
        valid_rows = np.asarray(self.table.valid)
        # pass 1: RemoveHeapTids (hnswvacuum.c:35-173) — vectorized: drop
        # dead TIDs and left-compact each element's slot row
        live_elems = np.flatnonzero(self.levels >= 0)
        er = self.elem_rows[live_elems]  # (L, 10)
        keep = (er >= 0) & valid_rows[np.maximum(er, 0)]
        order = np.argsort(~keep, axis=1, kind="stable")
        self.elem_rows[live_elems] = np.take_along_axis(
            np.where(keep, er, -1), order, axis=1
        )
        deleting = [int(e) for e in live_elems[~keep.any(axis=1)]]
        if not deleting:
            return
        deleting_set = set(deleting)
        dead_mask = np.zeros(self.cap_e, bool)
        dead_mask[deleting] = True
        dead_dev = jnp.asarray(dead_mask)

        # which live elements reference a deleting element at ANY layer —
        # computed before the strip; feeds the NeedsUpdated condition
        # (hnswvacuum.c:178-220: every layer is checked, not just layer 0)
        ref0 = np.asarray(jnp.any(
            dead_dev[jnp.maximum(self.nbr0, 0)] & (self.nbr0 >= 0), axis=1
        ))[: self.n_elems]
        ref_up_slot = np.asarray(jnp.any(
            dead_dev[jnp.maximum(self.nbr_up, 0)] & (self.nbr_up >= 0),
            axis=(1, 2),
        ))
        ref_any = ref0.copy()
        ups = self.up_slot[: self.n_elems]
        has_up = ups >= 0
        ref_any[has_up] |= ref_up_slot[ups[has_up]]

        # pass 2: RepairGraph (hnswvacuum.c:378-502)
        # 2a. entry point replacement (RepairGraphEntryPoint :279-373)
        if self.entry in deleting_set:
            survivors = [e for e in live_elems if e not in deleting_set]
            if survivors:
                lvls = self.levels[survivors]
                j = int(np.argmax(lvls))
                self.entry = int(survivors[j])
                self.entry_level = int(lvls[j])
            else:
                self.entry, self.entry_level = -1, -1
        # 2b. strip dead ids from all neighbor lists
        self.nbr0 = jnp.where(dead_dev[jnp.maximum(self.nbr0, 0)] & (self.nbr0 >= 0),
                              -1, self.nbr0)
        self.nbr_up = jnp.where(dead_dev[jnp.maximum(self.nbr_up, 0)] & (self.nbr_up >= 0),
                                -1, self.nbr_up)
        self.kept0 = self.kept0 & (self.nbr0 >= 0)
        self.kept_up = self.kept_up & (self.nbr_up >= 0)
        # 2c. re-link affected elements: NeedsUpdated (hnswvacuum.c:178-220)
        # = any layer's list referenced a deleting element, or the level-0
        # list is not full (:211-215).  _repair_elements re-searches at the
        # element's full level range, so upper-level lists are repaired too.
        if self.entry >= 0:
            nbr0_host = np.asarray(self.nbr0[: self.n_elems])
            lens = (nbr0_host >= 0).sum(axis=1)
            affected = np.flatnonzero(
                (self.levels[: self.n_elems] >= 0) & ~dead_mask[: self.n_elems]
                & (ref_any | (lens < 2 * self.m))
            )
            if len(affected):
                self._repair_elements(affected)

        # pass 3: ConfirmRepaired (hnswvacuum.c:507-589)
        bad0 = jnp.any(dead_dev[jnp.maximum(self.nbr0, 0)] & (self.nbr0 >= 0))
        badu = jnp.any(dead_dev[jnp.maximum(self.nbr_up, 0)] & (self.nbr_up >= 0))
        if bool(bad0) or bool(badu):
            raise InternalError("hnsw graph not repaired")

        # pass 4: MarkDeleted (hnswvacuum.c:594-729) — free slots for reuse
        for e in deleting:
            for r in self.elem_rows[e]:
                if r >= 0:
                    self.row_to_elem.pop(int(r), None)
            self.levels[e] = -1
            self.elem_rows[e, :] = -1
            self.free_slots.append(int(e))
        # zero their value data so dedup keys can't match (MarkDeleted zeroes
        # vector data, hnswvacuum.c:694-699).  The at[].set below produces a
        # private copy — identity held until now, so it doubles as the
        # alias materialization; the flag must drop so _refresh_alias can't
        # clobber the zeroed copy
        self._refresh_alias()
        self._alias_values = False
        dele = jnp.asarray(np.asarray(deleting, np.int32))
        if self.kind == "sparse":
            self.values = (
                self.values[0].at[dele].set(int(D.SPARSE_PAD)),
                self.values[1].at[dele].set(0),
            )
        else:
            self.values = (self.values[0].at[dele].set(0),)
        self.nbr0 = self.nbr0.at[dele].set(-1)
        self.kept0 = self.kept0.at[dele].set(False)
        up = [self.up_slot[e] for e in deleting if self.up_slot[e] >= 0]
        if up:
            up_dev = jnp.asarray(np.asarray(up, np.int32))
            self.nbr_up = self.nbr_up.at[up_dev].set(-1)
            self.kept_up = self.kept_up.at[up_dev].set(False)
        if self.dedup:
            self._dup_index = {
                key: e for key, e in self._dup_index.items() if e not in deleting_set
            }
        self._dirty = True

    def _repair_elements(self, elems: np.ndarray) -> None:
        """RepairGraphElement (hnswvacuum.c:225-274): recompute neighbors
        from scratch with a fresh search wave and overwrite the lists."""
        lv = self.levels[elems]
        wave = self._effective_wave_size()
        for start in range(0, len(elems), wave):
            chunk = elems[start: start + wave]
            self._insert_wave_repair(chunk, lv[start: start + wave])

    def _insert_wave_repair(self, elems: np.ndarray, lv: np.ndarray) -> None:
        """Like _insert_wave but for existing elements (existing=true search,
        hnswutils.c:1278): self-links excluded from candidate pools."""
        if self.entry < 0 or len(elems) == 0:
            return
        if self.backlink_mode == "incremental":
            pools = self._search_wave(elems, lv, exclude_self=True)
            self._connect_from_pools(elems, lv, pools)
        else:
            self._insert_wave_fused(elems, lv, exclude_self=True)

    # ------------------------------------------------------------- statistics
    @property
    def live_elements(self) -> int:
        return int((self.levels >= 0).sum())


def _count_found(acc_r: List[np.ndarray], nq: int) -> np.ndarray:
    """Distinct result rows collected so far per query (vectorized — one
    sort over the whole batch, no per-query host loop)."""
    s = np.sort(np.concatenate(acc_r, axis=1), axis=1)
    new = np.concatenate(
        [s[:, :1] >= 0, (s[:, 1:] != s[:, :-1]) & (s[:, 1:] >= 0)], axis=1)
    return new.sum(axis=1, dtype=np.int64)


def _dup_keys(host_vals: List[np.ndarray]) -> List[bytes]:
    n = host_vals[0].shape[0]
    return [
        b"".join(arr[i].tobytes() for arr in host_vals) for i in range(n)
    ]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, donate_argnames=("out",))
def _fill_nbr_vals(out, vecs, nb, s):
    pv = vecs[jnp.maximum(nb, 0)].astype(out.dtype)
    return jax.lax.dynamic_update_slice(out, pv, (s, 0, 0))


def _round_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
