"""IVFFlat index — the TPU rewrite of src/ivfflat.c + ivfbuild.c +
ivfkmeans.c + ivfscan.c + ivfinsert.c + ivfvacuum.c.

Layout translation (SURVEY.md §7): centroids are an HBM ``f32[lists, D]``
block; posting lists are a padded ``int32[lists, cap]`` row-id matrix (the
array-ified page chains of ivfbuild.c:271-331).  Build phases mirror the
reference's four progress phases (ivfflat.c:64-80):

1. *sampling* — reservoir sample of ``max(50·lists, 10000)`` live rows
   (ivfbuild.c:434-480),
2. *performing k-means* — k-means++ + Lloyd's on the MXU (ivf_kmeans.py),
3. *assigning tuples* — one argmin matmul over all rows (the parallel
   tuplesort of ivfbuild.c:971-1035 collapses into an argsort),
4. *loading tuples* — scatter row ids into the posting matrix.

Scan (ivfscan.c): distances to all centers → ``probes`` nearest lists →
gather candidates → exact distances → top-k; iterative scans
(ivfflat.iterative_scan=relaxed_order) fetch the next probe batch until
enough results pass the filter, capped at max_probes (ivfscan.c:268-277,
400-406).

Supported opclasses match the reference (sql/vector.sql:406-425, 819-841,
894-899): vector/halfvec × {l2, ip, cosine} and bit × hamming.  Cosine
indexes store normalized vectors and order by negative IP
(sql/vector.sql:412-425); zero-norm vectors are not indexed
(ivfbuild.c:174-179) and inserts of them are skipped (ivfinsert.c:91-100).
Vacuum drops dead ids from postings and never retrains centers
(ivfvacuum.c:18-143).
"""

from __future__ import annotations

from typing import Optional, Tuple

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..errors import DataException, FeatureNotSupported
from ..ops import distance as D
from ..ops.metric import Metric
from ..ops.topk import merge_topk
from ..store.table import BitTable, DenseTable
from ..utils.stats import ScanStats
from ..utils.telemetry import Progress, timers
from .ivf_kmeans import train_centers

#: reloption bounds — src/ivfflat.h:54-58
DEFAULT_LISTS = 100
MIN_LISTS, MAX_LISTS = 1, 32768

#: per-type dimension caps for this AM (IvfflatTypeInfo, src/ivfutils.c:282-423)
MAX_DIM_F32 = 2000
MAX_DIM_F16 = 4000
MAX_DIM_BIT = 64000

DENSE_OPCLASSES = (Metric.L2, Metric.IP, Metric.COSINE)
BIT_OPCLASSES = (Metric.HAMMING,)

#: finite "masked" sentinel for the inverted scan — the grouped-selection
#: one-hot matmul would turn inf·0 into NaN; any real score is far below
_IVF_BIG = jnp.float32(3.0e38)


class IVFFlatIndex:
    """An IVFFlat access method over a DenseTable or BitTable."""

    def __init__(
        self,
        table,
        metric: Metric,
        lists: int = DEFAULT_LISTS,
        seed: int = 0,
        build: bool = True,
        notice_hook=None,
        progress=None,
        mesh=None,
    ):
        #: optional jax.sharding.Mesh: k-means trains data-parallel over it
        #: (sample-sharded Lloyd steps with psum'd center stats — the
        #: reference's parallel k-means phase, ivfbuild.c:829-966)
        self.mesh = mesh
        if not MIN_LISTS <= lists <= MAX_LISTS:
            raise DataException(
                f'value {lists} out of bounds for option "lists"'
            )
        self.table = table
        self.metric = metric
        self.lists = lists
        self.seed = seed
        self.notice_hook = notice_hook or (lambda msg: None)
        #: pg_stat_user_indexes / nsearches analogue (utils/stats.py)
        self.stats = ScanStats()
        self.progress = progress or Progress()
        self._is_bit = isinstance(table, BitTable)
        if self._is_bit:
            if metric not in BIT_OPCLASSES:
                raise FeatureNotSupported(
                    f"operator class bit_{metric.name.lower()}_ops does not exist for ivfflat"
                )
            if table.dim > MAX_DIM_BIT:
                raise DataException(
                    f"column cannot have more than {MAX_DIM_BIT} dimensions for ivfflat index"
                )
        else:
            if metric not in DENSE_OPCLASSES:
                raise FeatureNotSupported(
                    f"operator {metric.op} is not supported by ivfflat"
                )
            cap = MAX_DIM_F16 if table.dtype != jnp.float32 else MAX_DIM_F32
            if table.dim > cap:
                raise DataException(
                    f"column cannot have more than {cap} dimensions for ivfflat index"
                )
        # index state
        self.centroids: Optional[jnp.ndarray] = None  # dense f32 / packed uint32 for bit
        self.centroids_f32: Optional[jnp.ndarray] = None  # float view for bit kmeans
        self.postings: Optional[np.ndarray] = None  # host (lists, cap) int32
        self.postings_flat: Optional[jnp.ndarray] = None  # compact slots
        self.list_lens: Optional[np.ndarray] = None  # host (lists,)
        self.indexed_mask: Optional[np.ndarray] = None  # host: which rows are indexed
        if build:
            self.build()

    # ------------------------------------------------------------------ build
    @property
    def _normalized(self) -> bool:
        return self.metric is Metric.COSINE

    @property
    def _spherical(self) -> bool:
        """IP and cosine opclasses both use spherical k-means: assignment by
        angular order (argmax ip) with centers re-normalized each round
        (KMEANS_DISTANCE/KMEANS_NORM wiring, sql/vector.sql:412-425)."""
        return self.metric in (Metric.IP, Metric.COSINE)

    def _index_values(self, rows: np.ndarray) -> Tuple[jnp.ndarray, np.ndarray]:
        """Fetch + form index values for given row ids: normalize for
        cosine (HnswFormIndexValue analogue ivfbuild.c:161-179), unpack for
        bit.  Returns (values_f32, keep_mask) — zero-norm rows are dropped
        for cosine."""
        t = self.table
        if self._is_bit:
            words = t.data[jnp.asarray(rows)]
            bits = _unpack_words(words, t.dim)
            return bits, np.ones(len(rows), bool)
        vals = t.data[jnp.asarray(rows)].astype(jnp.float32)
        if self._normalized:
            norms = np.asarray(jnp.sqrt(jnp.sum(vals * vals, axis=1)))
            keep = norms > 0
            vals = vals / jnp.maximum(jnp.asarray(norms)[:, None], 1e-30)
            return vals, keep
        return vals, np.ones(len(rows), bool)

    def build(self) -> None:
        """BuildIndex — ivfbuild.c:1040-1060; phases mirror
        ivfflatbuildphasename (ivfflat.c:64-80)."""
        t = self.table
        self.progress.set_phase("initializing")
        live = np.flatnonzero(np.asarray(t.valid[: t.count]))
        n_live = len(live)
        rng = np.random.default_rng(self.seed)

        # phase 1: sample (SampleRows reservoir, ivfbuild.c:132-156)
        target = max(50 * self.lists, 10000)
        if n_live == 0:
            sample_rows = np.zeros(0, np.int64)
        elif n_live <= target:
            sample_rows = live
        else:
            sample_rows = rng.choice(live, size=target, replace=False)
        if n_live < self.lists:
            self.notice_hook(
                "ivfflat index created with little data\n"
                "DETAIL:  This will cause low recall.\n"
                "HINT:  Drop the index until the table has more data."
            )

        # phase 2: k-means
        self.progress.set_phase("performing k-means")
        if len(sample_rows) == 0:
            # RandomCenters on empty table (ivfkmeans.c:110-133)
            dim = self.table.dim
            centers = jnp.asarray(
                rng.random((self.lists, dim)).astype(np.float32)
            )
            if self._is_bit:
                centers = (centers > 0.5).astype(jnp.float32)
            elif self._normalized:
                centers = centers / jnp.maximum(
                    jnp.linalg.norm(centers, axis=1, keepdims=True), 1e-30
                )
        else:
            samples, keep = self._index_values(sample_rows)
            if not keep.all():
                samples = samples[jnp.asarray(np.flatnonzero(keep))]
            with timers.phase("ivfflat.kmeans"):
                if self.mesh is not None and np.prod(
                        list(self.mesh.shape.values())) > 1:
                    from ..parallel.sharded import train_centers_sharded

                    s = samples
                    if self._normalized:
                        nrm = jnp.sqrt(jnp.sum(s * s, axis=1, keepdims=True))
                        s = s / jnp.maximum(nrm, 1e-30)
                    centers = train_centers_sharded(
                        self.mesh, s, self.lists,
                        spherical=self._spherical, binary=self._is_bit,
                        seed=self.seed,
                    )
                else:
                    centers = train_centers(
                        samples,
                        self.lists,
                        spherical=self._spherical,
                        binary=self._is_bit,
                        normalize_data=self._normalized,
                        seed=self.seed,
                    )
        self.centroids_f32 = centers
        if self._is_bit:
            self.centroids = D.pack_bits(centers > 0.5)
        else:
            self.centroids = centers

        # phases 3+4: assign + load
        self.progress.set_phase("assigning tuples", len(live))
        with timers.phase("ivfflat.assign"):
            self._assign_all(live)
        self.progress.set_phase("loading tuples", len(live))
        if os.environ.get("PGVECTOR_TPU_KMEANS_DEBUG", "0") == "1":
            m = self.kmeans_metrics()
            self.notice_hook(f"inertia: {m['inertia']:.3e}")
            if m["davies_bouldin"] is not None:
                self.notice_hook(f"davies-bouldin: {m['davies_bouldin']:.3f}")

    def _assign_all(self, rows: np.ndarray) -> None:
        """Assignment matmul + posting scatter (ivfbuild.c:971-1035)."""
        n_total = self.table.capacity
        assignments = np.full(n_total, -1, np.int64)
        if len(rows):
            chunk = 65536
            for s in range(0, len(rows), chunk):
                rs = rows[s: s + chunk]
                vals, keep = self._index_values(rs)
                a = np.array(self._nearest_center(vals))
                a[~keep] = -1  # zero-norm cosine rows not indexed
                assignments[rs] = a
        self._load_postings(assignments)

    def _nearest_center(self, vals: jnp.ndarray) -> jnp.ndarray:
        if self._is_bit:
            # hamming order == L2 order on unpacked bits vs binary centers
            c = self.centroids_f32
        else:
            c = self.centroids
        ip = jax.lax.dot_general(
            vals, c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=D.dot_precision(),
        )
        if self._spherical:
            return jnp.argmax(ip, axis=1).astype(jnp.int32)
        c_sq = jnp.sum(c * c, axis=1)
        return jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=1).astype(jnp.int32)

    def _load_postings(self, assignments: np.ndarray) -> None:
        """Lay row ids out in *compact block* form — the device-side
        equivalent of the reference's sort-by-list-id load (the parallel
        tuplesort of ivfbuild.c:1017-1035 becomes one stable argsort +
        one vectorized scatter; no per-row host loop).

        Layout: each list occupies ``ceil(len/cs)`` consecutive blocks of
        ``cs`` slots in one flat slot array (CSR with block-quantized
        offsets — the array form of the reference's per-list page chains,
        ivfbuild.c:271-331).  A padded (lists, max_len) matrix would cost
        ``lists·max_len`` device slots — measured 13× the row count at
        10M/4000 lists under k-means skew, i.e. ~67 GB of value copies on
        a 16 GB chip — while the compact form is ``N + lists·cs/2``."""
        rows = np.flatnonzero(assignments >= 0)
        a = assignments[rows].astype(np.int64)
        counts = np.bincount(a, minlength=self.lists) if len(rows) else \
            np.zeros(self.lists, np.int64)
        cap = max(8, _next_pow2(int(counts.max()) if len(rows) else 1))
        postings = np.full((self.lists, cap), -1, np.int32)
        # compact block geometry
        cs = min(self.POST_BLOCK, cap)
        occ = (counts + cs - 1) // cs  # blocks per list
        bs = np.zeros(self.lists + 1, np.int64)
        bs[1:] = np.cumsum(occ)
        flat = np.full(max(int(bs[-1]), 1) * cs, -1, np.int32)
        if len(rows):
            order = np.argsort(a, kind="stable")
            sr, sa = rows[order], a[order]
            starts = np.zeros(self.lists, np.int64)
            starts[1:] = np.cumsum(counts)[:-1]
            pos = np.arange(len(sr)) - starts[sa]
            postings[sa, pos] = sr
            flat[bs[sa] * cs + pos] = sr
        self.postings = postings  # host-side canonical (lists, cap) view
        self._post_cs = cs
        self._blk_start = bs          # host (lists+1,) block offsets
        self._blk_occ = occ           # host (lists,) blocks per list
        self.postings_flat = jnp.asarray(flat)
        self._blk_start_dev = jnp.asarray(bs[:-1].astype(np.int32))
        self._blk_occ_dev = jnp.asarray(occ.astype(np.int32))
        self.list_lens = counts.astype(np.int64)
        self.assignments = assignments
        self.indexed_mask = assignments >= 0
        self._refresh_post_values()

    #: rows per contiguous value block — the probe scan's gather unit
    POST_BLOCK = 512

    #: use the inverted (query-grouped) scan when the probed coverage is
    #: high enough that streaming every list's slab beats gathering — the
    #: gather engine moves ~6 GB/s on 256 KB blocks while dynamic_slice
    #: streams at HBM bandwidth (BENCH_NOTES.md), so inversion wins down
    #: to a few percent coverage
    INVERT_COVERAGE = 32

    def _refresh_post_values(self) -> None:
        """Materialize the index's own value copy in *posting order* —
        the TPU analogue of the reference's entry pages, which store each
        list's tuples contiguously (InsertTuples, ivfbuild.c:271-331).

        Probing then streams whole (cs, dim) contiguous blocks of the
        compact slot array instead of one random table row per candidate:
        at 1M rows / probes=10 the per-row gather moved ~10 GB of
        scattered 512-byte reads per 1000-query batch (measured 352 qps);
        block reads stream the same bytes at near-HBM bandwidth.  Values
        are stored *formed* (normalized for cosine opclasses,
        sql/vector.sql:437-441) in the table's dtype.

        The whole refresh runs as ONE jitted program: executed eagerly,
        the gather/mask/square/reduce chain materializes each op's full
        (NB·cs, W) output (~17 GB of transients at 10M×128-d f32 — a
        measured HBM OOM); fused, the peak is table + the posting copy."""
        self.post_values, self.post_vsq = _post_values_fused(
            self.table.data, self.postings_flat, self._post_cs,
            bool(self._normalized), bool(self._is_bit))

    # ----------------------------------------------------------------- insert
    def insert(self, rows) -> None:
        """aminsert — assign new rows to their nearest list
        (FindInsertPage ivfinsert.c:19-67) and append to the posting matrix."""
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        if self.postings is None:
            raise DataException("index has not been built")
        vals, keep = self._index_values(rows)
        a = np.array(self._nearest_center(vals))
        a[~keep] = -1
        # grow bookkeeping to table capacity
        if len(self.assignments) < self.table.capacity:
            grown = np.full(self.table.capacity, -1, np.int64)
            grown[: len(self.assignments)] = self.assignments
            self.assignments = grown
        self.assignments[rows] = a
        self.indexed_mask = self.assignments >= 0
        live = a >= 0
        if not live.any():
            return
        cs = self._post_cs
        # a batch fits in place iff every touched list keeps len ≤ its
        # allocated blocks (tail-block spare slots — the array analogue of
        # the reference's insertPage free space, ivfinsert.c:72-181);
        # otherwise re-lay the compact blocks (≈ the reference extending a
        # list's page chain, amortized over the spare half-block)
        extra = np.bincount(a[live], minlength=self.lists)
        if ((self.list_lens + extra) > self._blk_occ * cs).any():
            self._load_postings(self.assignments)
            return
        ins_rows, ins_a = rows[live], a[live].astype(np.int64)
        # vectorized append: slot = current fill + within-batch rank
        order = np.argsort(ins_a, kind="stable")
        sr, sa = ins_rows[order], ins_a[order]
        batch_counts = np.bincount(sa, minlength=self.lists)
        starts = np.zeros(self.lists, np.int64)
        starts[1:] = np.cumsum(batch_counts)[:-1]
        pos = self.list_lens[sa] + (np.arange(len(sr)) - starts[sa])
        self.postings[sa, pos] = sr
        self.list_lens = self.list_lens + batch_counts
        flat_slots = self._blk_start[sa] * cs + pos
        self.postings_flat = self.postings_flat.at[
            jnp.asarray(flat_slots.astype(np.int32))].set(
                jnp.asarray(sr.astype(np.int32)))
        # targeted post_values update: scatter the formed values of just
        # the appended rows into their (block, offset) slots
        blk = jnp.asarray((self._blk_start[sa] + pos // cs).astype(np.int32))
        off_in = jnp.asarray((pos % cs).astype(np.int32))
        v = self.table.data[jnp.asarray(sr)]
        if not self._is_bit and self._normalized:
            vf = v.astype(jnp.float32)
            nrm = jnp.sqrt(jnp.sum(vf * vf, axis=-1, keepdims=True))
            v = (vf / jnp.maximum(nrm, 1e-30)).astype(v.dtype)
        self.post_values = self.post_values.at[blk, off_in].set(v)
        if not self._is_bit:
            vf32 = v.astype(jnp.float32)
            self.post_vsq = self.post_vsq.at[blk, off_in].set(
                jnp.sum(vf32 * vf32, axis=-1))

    # ----------------------------------------------------------------- vacuum
    def vacuum(self) -> None:
        """ivfflatbulkdelete — drop dead ids; centers never retrained
        (ivfvacuum.c:18-143)."""
        valid = np.asarray(self.table.valid)
        assignments = self.assignments.copy()
        dead = ~valid[: len(assignments)]
        assignments[: len(dead)][dead] = -1
        self._load_postings(assignments)

    # ------------------------------------------------------------ diagnostics
    def kmeans_metrics(self) -> dict:
        """IVFFLAT_KMEANS_DEBUG analogue (PrintKmeansMetrics,
        ivfbuild.c:558-601): clustering quality of the current assignment.

        - ``inertia``: Σ over indexed tuples of the opclass distance to
          their list's center (the reference accumulates minDistance per
          tuple, ivfbuild.c:195).
        - ``davies_bouldin``: mean over lists of max_{j≠i} (s_i+s_j)/d_ij
          where s is the per-list mean member distance and d the
          center-to-center opclass distance (None when lists ≤ 1, matching
          the reference's guard).

        The reference computes these tuple-at-a-time during AddTupleToSort;
        here one batched distance matmul per 64k chunk, same numbers."""
        lists = self.lists
        assigns = self.assignments[: self.table.capacity]
        valid = np.asarray(self.table.valid[: len(assigns)])
        rows = np.flatnonzero((assigns >= 0) & valid)
        cent = self.centroids_f32 if self._is_bit else self.centroids

        def proc_scores(a, b):
            # the opclass kmeans distance proc: Hamming == L2² on 0/1
            # unpacked bits; spherical opclasses (IP/cosine) use
            # acos(ip)/π (vector_spherical_distance, src/vector.c:703-721);
            # L2 uses the squared distance
            if self._spherical and not self._is_bit:
                ip = np.asarray(a, np.float64) @ np.asarray(b, np.float64).T
                return np.arccos(np.clip(ip, -1.0, 1.0)) / np.pi
            return np.asarray(D.dense_scores(Metric.L2, a, b), np.float64)

        inertia = 0.0
        sums = np.zeros(lists, np.float64)
        counts = np.zeros(lists, np.int64)
        for s in range(0, len(rows), 65536):
            rs = rows[s: s + 65536]
            vals, keep = self._index_values(rs)
            a = assigns[rs]
            sc = proc_scores(vals, cent)
            d = sc[np.arange(len(rs)), a][keep]
            inertia += float(d.sum())
            sums += np.bincount(a[keep], weights=d, minlength=lists)
            counts += np.bincount(a[keep], minlength=lists)
        db = None
        if lists > 1:
            s_mean = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
            cd = proc_scores(cent, cent)
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = (s_mean[:, None] + s_mean[None, :]) / cd
            np.fill_diagonal(ratio, -np.inf)
            db = float(np.nanmax(ratio, axis=1).mean())
        return {"inertia": inertia, "davies_bouldin": db}

    # ----------------------------------------------------------------- search
    def _form_queries(self, q) -> jnp.ndarray:
        t = self.table
        if self._is_bit:
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
            return _unpack_words(D.pack_bits(jnp.asarray(arr)), t.dim)
        from .flat import _coerce_dense_queries

        qs = _coerce_dense_queries(q, t.dim)
        if self._normalized:
            norms = jnp.sqrt(jnp.sum(qs * qs, axis=1, keepdims=True))
            qs = qs / jnp.maximum(norms, 1e-30)  # GetScanValue normalize
        return qs

    def search(
        self,
        q,
        k: int,
        probes: Optional[int] = None,
        filter_mask: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k scan.  Returns (operator distances, row ids), -1/inf padded.

        ``probes`` defaults to the ``ivfflat.probes`` GUC; when
        ``ivfflat.iterative_scan`` is ``relaxed_order``, additional probe
        batches run until k results pass the filter or ``ivfflat.max_probes``
        is reached (ivfscan.c:268-277, 400-406).
        """
        if self.postings is None:
            raise DataException("index has not been built")
        probes = int(
            config.validate("ivfflat.probes", probes)
            if probes is not None
            else config.get("ivfflat.probes")
        )
        iterative = config.get("ivfflat.iterative_scan") != "off"
        max_probes = (
            max(int(config.get("ivfflat.max_probes")), probes)
            if iterative
            else probes
        )
        probes = min(probes, self.lists)
        max_probes = min(max_probes, self.lists)

        qs = self._form_queries(q)
        nq = qs.shape[0]
        order = self._probe_order(qs, max_probes)  # (Q, max_probes)

        valid = self.table.valid
        fmask = (
            jnp.asarray(filter_mask, dtype=bool)
            if filter_mask is not None
            else None
        )
        # one host sync per CALL, not per probe batch (each sync is a
        # tunnel-latency stall on the remote-TPU image): the any-dead bit
        # is invariant while this search runs
        any_dead = bool(jnp.any(~valid[: self.table.count]))

        best_d = jnp.full((nq, k), jnp.inf, jnp.float32)
        best_i = jnp.full((nq, k), -1, jnp.int32)
        off = 0
        while off < max_probes:
            batch = min(probes, max_probes - off)
            d, i = self._probe_batch(qs, order, off, batch, k, valid, fmask,
                                     any_dead)
            best_d, best_i = merge_topk(best_d, best_i, d, i, k)
            off += batch
            if not iterative:
                break
            found = int(jnp.min(jnp.sum(jnp.isfinite(best_d), axis=1)))
            if found >= k:
                break
        best_i = jnp.where(jnp.isinf(best_d), -1, best_i)
        # one blocking fetch for both outputs (two sequential np.asarray
        # calls pay the tunnel round-trip twice at small batches)
        d, r = jax.device_get((self._user_dist(best_d), best_i))
        # nsearches counts probe batches (one "Index Search" per re-probe)
        self.stats.count(nq, r, rounds=(off + probes - 1) // probes)
        return d, r

    def _user_dist(self, stored: jnp.ndarray) -> jnp.ndarray:
        from ..ops.metric import stored_to_user

        return stored_to_user(self.metric, stored)

    def _probe_order(self, qs: jnp.ndarray, max_probes: int) -> jnp.ndarray:
        """GetScanLists — distance to every list center, nearest-first
        (ivfscan.c:47-118)."""
        if self._is_bit:
            scores = D.dense_scores(Metric.L2, qs, self.centroids_f32)
        elif self._spherical:
            # probe order = angular distance to centers (GetScanLists uses
            # the KMEANS_DISTANCE proc); equals -ip since centers are unit
            scores = D.dense_scores(Metric.IP, qs, self.centroids)
        else:
            scores = D.dense_scores(self.metric, qs, self.centroids)
        _, order = jax.lax.top_k(-scores, max_probes)
        return order

    def _probe_batch(self, qs, order, off, batch, k, valid, fmask,
                     any_dead: bool = True):
        """GetScanItems for one probe window (ivfscan.c:123-187).

        Two device formulations, picked by probe coverage:

        - *inverted* (high coverage): group queries BY PROBED LIST, then
          stream every list's contiguous slab once via dynamic_slice and
          score it against all of its probing queries in one batched
          matmul — zero value gathers.  Total value traffic is one table
          read per batch regardless of Q, so large batches amortize to
          ~N/Q rows per query.
        - *block-gather* (low coverage): gather whole (POST_BLOCK, dim)
          blocks of just the selected lists (round-2 path).
        """
        nq = qs.shape[0]
        if (not self._is_bit
                and nq * batch * self.INVERT_COVERAGE >= self.lists):
            return self._probe_batch_inverted(
                qs, order, off, batch, k, valid, fmask, any_dead)
        return self._probe_batch_blocks(qs, order, off, batch, k, valid, fmask)

    #: work-item shape knobs for the inverted scan: each item scores a
    #: chunk of ≤ WORK_QC queries that probed one list against one window
    #: of that list's posting slab (≈ WORK_SLOTS slots).  Fixed shapes kill
    #: the padding skew of the earlier (lists, qcap)·(lists, cap) form,
    #: where one hot list (qcap 4096 on a 40-query average) and one long
    #: list (cap 8192 on a 1000-row average) inflated the scored volume
    #: ~840× over the real edge work (profiled at 1M/4000q/probes=10).
    WORK_QC = 64
    WORK_SLOTS = 1024

    def _probe_batch_inverted(self, qs, order, off, batch, k, valid, fmask,
                              any_dead: bool = True):
        """Per-list inversion of the probe scan (BENCH_NOTES.md roadmap #1).

        The reference scans each probed list's entry pages per query
        (ivfscan.c:123-187); with thousands of concurrent queries the same
        list is probed by many of them, so the TPU form flips the loop:
        each probed list's slab is streamed once and scored against all of
        its probing queries.  The (query → list) edge set is decomposed
        host-side into fixed-shape work items — (list, ≤WORK_QC queries,
        one slab window) — so neither query skew nor list-length skew
        inflates the scored volume; the host already syncs the probe
        selection for bucketing, so this costs no extra round-trip."""
        nq = qs.shape[0]
        sel_np = np.asarray(
            jax.lax.dynamic_slice(order, (0, off), (nq, batch)))
        cs = self._post_cs
        Qc, Wb = _adaptive_item_shape(
            sel_np.reshape(-1), self._blk_occ, cs,
            self.WORK_QC, self.WORK_SLOTS)
        work = _build_work_items(sel_np, self._blk_start, self._blk_occ,
                                 Qc, Wb)
        if work is None:  # every probed list is empty
            return (jnp.full((nq, k), jnp.inf, jnp.float32),
                    jnp.full((nq, k), -1, jnp.int32))
        eq, blkbase, wlen, qmap = work
        # slot-order validity: the kernel works in compact-slot space and
        # never touches row ids until the end, so deletes/filters must be
        # expressed per posting slot.  Fast path: nothing dead, no filter →
        # ok ≡ slot occupied (postings_flat >= 0), no gather at all.
        if fmask is None and not any_dead:
            ok_post = self.postings_flat >= 0
        else:
            fm = fmask if fmask is not None else \
                jnp.ones(self.table.capacity, jnp.bool_)
            safe = jnp.maximum(self.postings_flat, 0)
            ok_post = (self.postings_flat >= 0) & valid[safe] & fm[safe]
        d, vids = _workitem_probe_topk(
            self.metric, self.post_values, self.post_vsq,
            ok_post.reshape(-1, cs), qs,
            jnp.asarray(eq), jnp.asarray(blkbase), jnp.asarray(wlen),
            jnp.asarray(qmap), k=k, Qc=Qc, Wb=Wb, cs=cs,
        )
        # virtual compact slot → row ids, one (Q, k) gather at the end
        rows = self.postings_flat[jnp.maximum(vids, 0)]
        return d, jnp.where(vids >= 0, rows, -1)

    def _probe_batch_blocks(self, qs, order, off, batch, k, valid, fmask):
        """Block-gather probe scan (round-2 path): gather whole contiguous
        (POST_BLOCK, dim) value blocks of the selected lists from the
        posting-ordered value copy, score, running top-k."""
        t = self.table
        nq = qs.shape[0]
        sel = jax.lax.dynamic_slice(
            order, (0, off), (nq, batch)
        )  # (Q, batch) list ids
        cs = self._post_cs
        ncs = max(int(self._blk_occ.max()), 1)
        # expand list ids to compact block ids (-1 past a list's last block)
        j = jnp.arange(ncs, dtype=sel.dtype)
        selb = self._blk_start_dev[sel][:, :, None] + j
        selb = jnp.where(j[None, None, :] < self._blk_occ_dev[sel][:, :, None],
                         selb, -1).reshape(nq, batch * ncs)
        width = t.words if self._is_bit else t.dim
        # blocks per chunk: gathered chunk ≤ ~64 MB
        bc = max(1, (1 << 26) // max(nq * cs * width * 4, 1))
        nb = selb.shape[1]
        n_chunks = max(1, -(-nb // bc))
        bc = -(-nb // n_chunks)
        if n_chunks * bc != nb:
            selb = jnp.concatenate(
                [selb, jnp.full((nq, n_chunks * bc - nb), -1, selb.dtype)],
                axis=1)
        if fmask is None:
            fmask = jnp.ones(t.capacity, jnp.bool_)
        qrep = D.pack_bits(qs > 0.5) if self._is_bit else qs
        return _probe_topk(
            self.metric, self._is_bit, self.post_values,
            self.postings_flat.reshape(-1, cs), qrep, selb, valid, fmask, k,
            n_chunks,
        )


@functools.partial(jax.jit, static_argnames=("cs", "normalized", "is_bit"))
def _post_values_fused(data, flat, cs: int, normalized: bool, is_bit: bool):
    """Posting-ordered value copy + per-slot |v|², fused (see
    _refresh_post_values docstring for the memory math)."""
    safe = jnp.maximum(flat, 0)
    pv = data[safe]  # (NB·cs, W)
    pv = jnp.where((flat >= 0)[:, None], pv, 0)
    if not is_bit and normalized:
        pvf = pv.astype(jnp.float32)
        nrm = jnp.sqrt(jnp.sum(pvf * pvf, axis=-1, keepdims=True))
        pv = (pvf / jnp.maximum(nrm, 1e-30)).astype(pv.dtype)
    w = pv.shape[-1]
    out = pv.reshape(-1, cs, w)
    if is_bit:
        return out, None
    pvf = pv.astype(jnp.float32)
    return out, jnp.sum(pvf * pvf, axis=-1).reshape(-1, cs)


def _adaptive_item_shape(sel_flat, blk_occ, cs: int,
                         qc_floor: int, slots_floor: int):
    """Pick (Qc, Wb) for the work-item decomposition from the probed-edge
    statistics (pow2-quantized → bounded jit variants).

    When the mean probing-query count per list crosses Qc, every list
    pays a second half-empty query chunk; when lists span many posting
    blocks, a small window multiplies items per list.  Both measured at
    10M/4000 lists/probes=63: the fixed (64, 2) shape tripled the item
    count on padding alone (394 qps vs 3,776 at probes=40)."""
    wb_floor = max(1, slots_floor // cs)
    probed = sel_flat[blk_occ[sel_flat] > 0]
    if len(probed) == 0:
        return qc_floor, wb_floor
    mean_q = len(probed) / max(len(np.unique(probed)), 1)
    qc = int(min(max(_next_pow2(int(mean_q * 1.25) + 1), qc_floor), 512))
    occ_mean = float(blk_occ[probed].mean())
    wb = int(min(max(_next_pow2(int(np.ceil(occ_mean / 2))), wb_floor), 8))
    return qc, wb


def _build_work_items(sel_np, blk_start, blk_occ, Qc: int, Wb: int):
    """Decompose the (query → probed list) edge set into fixed-shape work
    items, fully vectorized on the host (numpy over ≤ Q·probes edges).

    A work item is (one list, ≤Qc of its probing queries, one window of
    ≤Wb consecutive posting blocks).  Returns ``(eq, blkbase, wlen, qmap)``:

    - ``eq``        (R, Qc) int32: query ids per item, -1 padded
    - ``blkbase``   (R,)    int32: first compact block id of the window
                    (a list's blocks are consecutive rows of the block
                    table, so the window is ``blkbase + arange(Wb)``)
    - ``wlen``      (R,)    int32: valid blocks in the window (a list's
                    last window may be short — blocks past it belong to
                    the NEXT list in the compact layout and must be
                    masked, not scored)
    - ``qmap``      (Q, emax) int32: for each query, the flat ``row·Qc +
                    slot`` work positions holding its results, -1 padded

    or None when no probed list has any postings.  This is the device
    analogue of the reference's per-query pairingheap of probed lists
    (ivfscan.c:47-118), re-cut for the MXU: fixed shapes mean query skew
    (one hot list) and list-length skew cost padding only within one item.
    """
    nq, batch = sel_np.shape
    occ = blk_occ
    win = (occ + Wb - 1) // Wb  # windows per list (0 for empty lists)
    qid = np.repeat(np.arange(nq, dtype=np.int64), batch)
    lid = sel_np.reshape(-1).astype(np.int64)
    keep = win[lid] > 0
    qid, lid = qid[keep], lid[keep]
    if len(lid) == 0:
        return None
    order = np.argsort(lid, kind="stable")
    qid_s, lid_s = qid[order], lid[order]
    ulist, inv, ucount = np.unique(lid_s, return_inverse=True,
                                   return_counts=True)
    nu = len(ulist)
    uwin = win[ulist]
    qch = (ucount + Qc - 1) // Qc
    rows_per = qch * uwin
    row0 = np.zeros(nu + 1, np.int64)
    row0[1:] = np.cumsum(rows_per)
    R = int(row0[-1])
    # per-item rows are (query-chunk major, window minor) within a list
    uidx_of_row = np.repeat(np.arange(nu), rows_per)
    within = np.arange(R) - row0[uidx_of_row]
    wrow = within % uwin[uidx_of_row]
    Rp = _next_pow2(R)
    blkbase = np.full(Rp, -1, np.int32)
    blkbase[:R] = (blk_start[ulist[uidx_of_row]] + wrow * Wb).astype(np.int32)
    wlen = np.zeros(Rp, np.int32)
    wlen[:R] = np.minimum(Wb, occ[ulist[uidx_of_row]] - wrow * Wb)
    # fill eq: edge j at rank r within its list sits in query-chunk r//Qc
    # slot r%Qc, replicated across the list's uwin windows
    estart = np.zeros(nu, np.int64)
    estart[1:] = np.cumsum(ucount)[:-1]
    rank = np.arange(len(lid_s)) - estart[inv]
    rep = uwin[inv]
    tot = int(rep.sum())
    eidx = np.repeat(np.arange(len(lid_s)), rep)
    w_off = np.arange(tot) - np.repeat(np.cumsum(rep) - rep, rep)
    rows_e = (row0[inv[eidx]] + (rank[eidx] // Qc) * rep[eidx] + w_off)
    slot_e = rank[eidx] % Qc
    eq = np.full((Rp, Qc), -1, np.int32)
    eq[rows_e, slot_e] = qid_s[eidx]
    # qmap: every (edge × window) result position, grouped per query
    flat_pos = rows_e * Qc + slot_e
    qe = qid_s[eidx]
    o2 = np.argsort(qe, kind="stable")
    qe_s, fp_s = qe[o2], flat_pos[o2]
    cnt_q = np.bincount(qe_s, minlength=nq)
    emax = _next_pow2(max(int(cnt_q.max()), 1))
    qmap = np.full((nq, emax), -1, np.int32)
    st = np.zeros(nq, np.int64)
    st[1:] = np.cumsum(cnt_q)[:-1]
    qmap[qe_s, np.arange(len(qe_s)) - st[qe_s]] = fp_s.astype(np.int32)
    return eq, blkbase, wlen, qmap


def _rowwise_smallest(s, kk: int):
    """(R, C) scores → smallest-kk (values, positions).  For wide C uses
    grouped selection: lax.top_k over a whole 8192-slot slab measured
    3.84 s/window at 1M — 12× the scoring matmul (0.32 s).  Reduce to
    per-64-slot minima (O(1)/element), top-k GROUPS (exact: ≤ kk groups
    can hold the kk nearest), then refine only kk·64 slots via a one-hot
    MXU select."""
    rows_c, capc = s.shape
    if not (capc >= 128 and kk * 64 < capc):
        neg, p = jax.lax.top_k(-s, kk)
        return -neg, p
    G = 64
    ng = capc // G
    kg = min(kk, ng)
    sg = s.reshape(rows_c, ng, G)
    gm = jnp.min(sg, axis=2)
    _, gsel = jax.lax.top_k(-gm, kg)  # (R, kg) group ids
    # pin the top_k output before feeding the one-hot select: this
    # toolchain has miscompiled selects fused behind top_k before
    # (the _row_gather workaround, BENCH_NOTES.md); recall dropped
    # 1.0 → 0.9833 without the barrier
    gsel = jax.lax.optimization_barrier(gsel)
    onehot = (gsel[:, :, None]
              == jnp.arange(ng, dtype=gsel.dtype)[None, None, :])
    ref = jax.lax.dot_general(
        onehot.astype(jnp.float32), sg,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        # the select must COPY scores exactly: default precision
        # would bf16-round sg, corrupting near-tie refinement
        # (measured recall 1.0 → 0.9833 on TPU)
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, kg, G)
    neg2, j2 = jax.lax.top_k(-ref.reshape(rows_c, kg * G), kk)
    j2 = jax.lax.optimization_barrier(j2)
    g_of = j2 // G
    gsel_pick = jnp.sum(
        jnp.where(g_of[:, :, None]
                  == jnp.arange(kg, dtype=j2.dtype)[None, None, :],
                  gsel[:, None, :], 0), axis=2)
    return -neg2, gsel_pick * G + j2 % G


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "Qc", "Wb", "cs")
)
def _workitem_probe_topk(metric, post_blocks, post_bsq, ok_blocks, qs,
                         eq, blkbase, wlen, qmap, k: int, Qc: int, Wb: int,
                         cs: int):
    """Fixed-shape work-item probe scan → per-query smallest-k
    (distances, virtual ids), a virtual id being the flat ``list·cap +
    slot`` posting position (the caller translates to row ids with one
    final gather — no gathers run fused behind top_k, where this
    toolchain has miscompiled before).

    Per work item: gather its Wb posting blocks (256 KB contiguous rows
    of the block table — row-count-bound, so a few thousand block rows
    cost microseconds), gather its ≤Qc query rows, one batched matmul,
    grouped top-k over the C = Wb·cs window.  Then one (Q, emax) gather
    re-groups item results per query and a final top_k merges."""
    Rp = eq.shape[0]
    NB, _, w = post_blocks.shape
    C = Wb * cs
    kk = min(k, C)
    nq, emax = qmap.shape
    # chunk size: bound the (rc, C, w) f32 value block to ~128 MB (960-d
    # halfvec windows are ~8× wider than 128-d SIFT rows)
    rc = 128
    while rc > 8 and rc * C * w * 4 > (1 << 27):
        rc //= 2
    rc = min(Rp, rc)
    n_steps = Rp // rc
    if metric is Metric.L2:
        qsq = jnp.sum(qs.astype(jnp.float32) ** 2, axis=1)
    woff = jnp.arange(Wb, dtype=jnp.int32)

    def step(_, c):
        base = c * rc
        eqc = jax.lax.dynamic_slice(eq, (base, 0), (rc, Qc))
        bbc = jax.lax.dynamic_slice(blkbase, (base,), (rc,))
        wlc = jax.lax.dynamic_slice(wlen, (base,), (rc,))
        bids = jnp.minimum(jnp.maximum(bbc, 0)[:, None] + woff,
                           NB - 1)  # (rc, Wb) clamped to the block table
        vals = post_blocks[bids].reshape(rc, C, w).astype(jnp.float32)
        # mask: dead rows, and slots past the window's valid blocks (a
        # short tail window would otherwise score the NEXT list's slab)
        okc = (ok_blocks[bids].reshape(rc, C)
               & (bbc >= 0)[:, None]
               & (jnp.arange(C, dtype=jnp.int32)[None, :]
                  < wlc[:, None] * cs))
        qv = qs[jnp.maximum(eqc, 0)].astype(jnp.float32)  # (rc, Qc, D)
        ip = jax.lax.dot_general(
            qv, vals,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=D.dot_precision(),
        )  # (rc, Qc, C)
        if metric is Metric.L2:
            bsq = post_bsq[bids].reshape(rc, C)
            qsq_c = qsq[jnp.maximum(eqc, 0)]
            s = jnp.maximum(qsq_c[:, :, None] - 2.0 * ip + bsq[:, None, :],
                            0.0)
        else:  # IP / normalized-cosine order by -ip
            s = -ip
        s = jnp.where(okc[:, None, :], s, _IVF_BIG)
        d_sel, p = _rowwise_smallest(s.reshape(rc * Qc, C), kk)
        d_sel = jnp.where(d_sel >= _IVF_BIG, jnp.inf, d_sel)
        # global posting-flat slot = window base slot + position in window
        # (inf/-pad entries carry garbage slots; the final merge masks
        # them before any caller-visible id is produced)
        vslot = (jnp.repeat(bbc, Qc).astype(jnp.int32)[:, None] * cs
                 + p.astype(jnp.int32))
        return None, (d_sel.reshape(rc, Qc, kk),
                      vslot.reshape(rc, Qc, kk))

    _, (d_all, v_all) = jax.lax.scan(
        step, None, jnp.arange(n_steps, dtype=jnp.int32))
    flat_d = d_all.reshape(Rp * Qc, kk)
    flat_v = v_all.reshape(Rp * Qc, kk)
    # re-group per query: (Q, emax) row gather of kk-wide result rows
    qm = jnp.maximum(qmap, 0)
    dm = flat_d[qm]  # (Q, emax, kk)
    vm = flat_v[qm]
    dm = jnp.where((qmap >= 0)[:, :, None], dm, jnp.inf)
    width = emax * kk
    dmf = dm.reshape(nq, width)
    vmf = vm.reshape(nq, width)
    if width < k:
        dmf = jnp.concatenate(
            [dmf, jnp.full((nq, k - width), jnp.inf, dmf.dtype)], axis=1)
        vmf = jnp.concatenate(
            [vmf, jnp.full((nq, k - width), -1, vmf.dtype)], axis=1)
        width = k
    negq, selq = jax.lax.top_k(-dmf, k)
    selq = jax.lax.optimization_barrier(selq)
    d_out = -negq
    # gather-free id pick (one-hot over emax·kk — small)
    col = jnp.arange(width, dtype=jnp.int32)
    hit = col[None, None, :] == selq[:, :, None]
    v_out = jnp.sum(jnp.where(hit, vmf[:, None, :], 0), axis=2)
    return d_out, jnp.where(jnp.isinf(d_out), -1, v_out)


@functools.partial(
    jax.jit, static_argnames=("metric", "is_bit", "k", "n_chunks")
)
def _probe_topk(metric, is_bit, post_values, post_blocks, qs, selb, valid,
                fmask, k: int, n_chunks: int):
    """(Q, NB) posting *block* ids → smallest-k (distances, row ids).

    Each scan step gathers (Q, Bc) whole value blocks — contiguous
    (cs, W) slabs of the posting-ordered copy — scores the (Q, Bc·cs)
    block (batched dot_general on the MXU / popcount lanes for bit), and
    merges into a running top-k.  Values are pre-formed (normalized for
    cosine) at _refresh_post_values time, mirroring the reference's
    entry-page tuple copies."""
    nq, nb = selb.shape
    bc = nb // n_chunks
    cs = post_values.shape[1]
    chunks = selb.reshape(nq, n_chunks, bc).transpose(1, 0, 2)  # (S, Q, Bc)

    def step(carry, blk_c):
        best_d, best_i = carry
        safeb = jnp.maximum(blk_c, 0)
        ids = post_blocks[safeb]  # (Q, Bc, cs)
        ids = jnp.where(blk_c[:, :, None] >= 0, ids, -1).reshape(nq, -1)
        safe = jnp.maximum(ids, 0)
        ok = (ids >= 0) & valid[safe] & fmask[safe]
        if is_bit:
            w = post_values[safeb].reshape(nq, bc * cs, -1)  # (Q, C, W)
            s = jnp.sum(
                jax.lax.population_count(
                    jnp.bitwise_xor(qs[:, None, :], w)
                ).astype(jnp.int32),
                axis=-1,
            ).astype(jnp.float32)
        else:
            v = post_values[safeb].reshape(nq, bc * cs, -1).astype(jnp.float32)
            ip = jax.lax.dot_general(
                qs, v,
                dimension_numbers=(((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=D.dot_precision(),
            )  # (Q, C)
            if metric is Metric.L2:
                vsq = jnp.sum(v * v, axis=-1)
                qsq = jnp.sum(qs * qs, axis=-1)[:, None]
                s = jnp.maximum(qsq - 2.0 * ip + vsq, 0.0)
            else:  # IP / normalized cosine order by -ip
                s = -ip
        s = jnp.where(ok, s, jnp.inf)
        d, i = merge_topk(best_d, best_i, s, ids, k)
        return (d, jnp.where(jnp.isinf(d), -1, i)), None

    init = (
        jnp.full((nq, k), jnp.inf, jnp.float32),
        jnp.full((nq, k), -1, selb.dtype),
    )
    (d, i), _ = jax.lax.scan(step, init, chunks)
    return d, i


def _next_pow2(n: int) -> int:
    p = 1
    while p < max(n, 1):
        p *= 2
    return p


def _unpack_words(words: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(…, W) uint32 → (…, dim) f32 in {0,1}, MSB-first."""
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    bits = (words[..., :, None] >> shifts) & jnp.uint32(1)
    flat = bits.reshape(words.shape[:-1] + (words.shape[-1] * 32,))
    return flat[..., :dim].astype(jnp.float32)
