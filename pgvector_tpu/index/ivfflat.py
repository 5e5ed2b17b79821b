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

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..errors import DataException, FeatureNotSupported
from ..ops import distance as D
from ..ops.metric import Metric
from ..ops.topk import merge_topk
from ..store.table import BitTable, DenseTable
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
        self.postings: Optional[jnp.ndarray] = None  # (lists, cap) int32, -1 pad
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
        """Scatter row ids into the posting matrix — the device-side
        equivalent of the reference's sort-by-list-id load (the parallel
        tuplesort of ivfbuild.c:1017-1035 becomes one stable argsort +
        one vectorized scatter; no per-row host loop)."""
        rows = np.flatnonzero(assignments >= 0)
        a = assignments[rows].astype(np.int64)
        counts = np.bincount(a, minlength=self.lists) if len(rows) else \
            np.zeros(self.lists, np.int64)
        cap = max(8, _next_pow2(int(counts.max()) if len(rows) else 1))
        postings = np.full((self.lists, cap), -1, np.int32)
        if len(rows):
            order = np.argsort(a, kind="stable")
            sr, sa = rows[order], a[order]
            starts = np.zeros(self.lists, np.int64)
            starts[1:] = np.cumsum(counts)[:-1]
            pos = np.arange(len(sr)) - starts[sa]
            postings[sa, pos] = sr
        self.postings = jnp.asarray(postings)
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

        Probing then gathers whole (POST_BLOCK, dim) contiguous blocks
        instead of one random table row per candidate: at 1M rows /
        probes=10 the per-row gather moved ~10 GB of scattered 512-byte
        reads per 1000-query batch (measured 352 qps); block gathers
        stream the same bytes at near-HBM bandwidth.  Values are stored
        *formed* (normalized for cosine opclasses, sql/vector.sql:437-441)
        in the table's dtype."""
        post = self.postings  # (lists, cap)
        cap = post.shape[1]
        cs = min(cap, self.POST_BLOCK)
        self._post_cs = cs
        safe = jnp.maximum(post, 0)
        pv = self.table.data[safe]  # (lists, cap, W)
        pv = jnp.where((post >= 0)[..., None], pv, 0)
        if not self._is_bit and self._normalized:
            pvf = pv.astype(jnp.float32)
            nrm = jnp.sqrt(jnp.sum(pvf * pvf, axis=-1, keepdims=True))
            pv = (pvf / jnp.maximum(nrm, 1e-30)).astype(pv.dtype)
        w = pv.shape[-1]
        self.post_values = pv.reshape(self.lists * (cap // cs), cs, w)
        # |v|² per posting slot (f32, from the stored values) — feeds the
        # inverted scan's L2 form without re-reducing the slab per call
        if not self._is_bit:
            pvf = pv.astype(jnp.float32)
            self.post_vsq = jnp.sum(pvf * pvf, axis=-1)  # (lists, cap)
        else:
            self.post_vsq = None

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
        post = np.array(self.postings)  # writable copy (np.asarray of a
        # device array can be a read-only view)
        cap = post.shape[1]
        # count final per-list fill to size capacity
        extra = np.bincount(a[a >= 0], minlength=self.lists)
        if (self.list_lens + extra).max() > cap:
            new_cap = _next_pow2(int((self.list_lens + extra).max()))
            post = np.concatenate(
                [post, np.full((self.lists, new_cap - cap), -1, np.int32)], axis=1
            )
        self.assignments[rows] = a
        live = a >= 0
        ins_rows, ins_a = rows[live], a[live].astype(np.int64)
        if len(ins_rows):
            # vectorized append: slot = current fill + within-batch rank
            order = np.argsort(ins_a, kind="stable")
            sr, sa = ins_rows[order], ins_a[order]
            batch_counts = np.bincount(sa, minlength=self.lists)
            starts = np.zeros(self.lists, np.int64)
            starts[1:] = np.cumsum(batch_counts)[:-1]
            pos = self.list_lens[sa] + (np.arange(len(sr)) - starts[sa])
            post[sa, pos] = sr
            self.list_lens = self.list_lens + batch_counts
        grew = post.shape[1] != int(self.postings.shape[1])
        self.postings = jnp.asarray(post)
        self.indexed_mask = self.assignments >= 0
        if len(ins_rows) == 0:
            return
        if grew:
            self._refresh_post_values()
            return
        # targeted post_values update: scatter the formed values of just
        # the appended rows into their (block, offset) slots
        cs = self._post_cs
        ncs = post.shape[1] // cs
        blk = jnp.asarray((sa * ncs + pos // cs).astype(np.int32))
        off_in = jnp.asarray((pos % cs).astype(np.int32))
        v = self.table.data[jnp.asarray(sr)]
        if not self._is_bit and self._normalized:
            vf = v.astype(jnp.float32)
            nrm = jnp.sqrt(jnp.sum(vf * vf, axis=-1, keepdims=True))
            v = (vf / jnp.maximum(nrm, 1e-30)).astype(v.dtype)
        self.post_values = self.post_values.at[blk, off_in].set(v)
        if not self._is_bit:
            vf32 = v.astype(jnp.float32)
            self.post_vsq = self.post_vsq.at[
                jnp.asarray(sa.astype(np.int32)),
                jnp.asarray(pos.astype(np.int32)),
            ].set(jnp.sum(vf32 * vf32, axis=-1))

    # ----------------------------------------------------------------- vacuum
    def vacuum(self) -> None:
        """ivfflatbulkdelete — drop dead ids; centers never retrained
        (ivfvacuum.c:18-143)."""
        valid = np.asarray(self.table.valid)
        assignments = self.assignments.copy()
        dead = ~valid[: len(assignments)]
        assignments[: len(dead)][dead] = -1
        self._load_postings(assignments)

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

        best_d = jnp.full((nq, k), jnp.inf, jnp.float32)
        best_i = jnp.full((nq, k), -1, jnp.int32)
        off = 0
        while off < max_probes:
            batch = min(probes, max_probes - off)
            d, i = self._probe_batch(qs, order, off, batch, k, valid, fmask)
            best_d, best_i = merge_topk(best_d, best_i, d, i, k)
            off += batch
            if not iterative:
                break
            found = int(jnp.min(jnp.sum(jnp.isfinite(best_d), axis=1)))
            if found >= k:
                break
        best_i = jnp.where(jnp.isinf(best_d), -1, best_i)
        return np.asarray(self._user_dist(best_d)), np.asarray(best_i)

    def _user_dist(self, stored: jnp.ndarray) -> jnp.ndarray:
        if self.metric is Metric.L2:
            return jnp.where(jnp.isinf(stored), stored, jnp.sqrt(jnp.maximum(stored, 0.0)))
        if self.metric is Metric.COSINE:
            return jnp.where(jnp.isinf(stored), stored, 1.0 + stored)
        return stored

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

    def _probe_batch(self, qs, order, off, batch, k, valid, fmask):
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
                qs, order, off, batch, k, valid, fmask)
        return self._probe_batch_blocks(qs, order, off, batch, k, valid, fmask)

    def _probe_batch_inverted(self, qs, order, off, batch, k, valid, fmask):
        """Per-list inversion of the probe scan (BENCH_NOTES.md roadmap #1).

        The reference scans each probed list's entry pages per query
        (ivfscan.c:123-187); with thousands of concurrent queries the same
        list is probed by many of them, so the TPU form flips the loop:
        one pass over all lists, each list's slab read once (contiguous —
        streams at HBM bandwidth) and scored against the up-to-``qcap``
        queries that probed it.  ``qcap`` is the max queries-per-list of
        this window, bucketed to a power of two to bound jit variants."""
        nq = qs.shape[0]
        sel = jax.lax.dynamic_slice(order, (0, off), (nq, batch))
        # host-side max queries-per-list → static qcap bucket
        counts = np.bincount(np.asarray(sel).reshape(-1), minlength=self.lists)
        qcap = _next_pow2(max(int(counts.max()), 8))
        cap = self.postings.shape[1]
        w = self.post_values.shape[-1]
        # list-chunk size: bound the (LC, qcap, cap) score block to ~64 MB
        lc = max(1, (1 << 24) // max(qcap * cap, 1))
        lc = min(_next_pow2(lc), self.lists)
        while self.lists % lc:
            lc //= 2
        if fmask is None:
            fmask = jnp.ones(self.table.capacity, jnp.bool_)
        # slot-order validity: the kernel works in (list, slot) space and
        # never touches row ids until the end, so deletes/filters must be
        # expressed per posting slot.  Fast path: nothing dead, no filter →
        # ok ≡ slot occupied (postings >= 0), no gather at all.
        if fmask is None and not bool(
                jnp.any(~valid[: self.table.count])):
            ok_post = self.postings >= 0
        else:
            fm = fmask if fmask is not None else \
                jnp.ones(self.table.capacity, jnp.bool_)
            safe = jnp.maximum(self.postings, 0)
            ok_post = (self.postings >= 0) & valid[safe] & fm[safe]
        d, vids = _inverted_probe_topk(
            self.metric, self.post_values.reshape(self.lists, cap, w),
            self.post_vsq, ok_post, qs, sel, k=k, qcap=qcap, lc=lc,
        )
        # virtual (list·cap + slot) → row ids, one (Q, k) gather at the end
        rows = self.postings.reshape(-1)[jnp.maximum(vids, 0)]
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
        cap = self.postings.shape[1]
        cs = self._post_cs
        ncs = cap // cs
        # expand list ids to block ids
        selb = (sel[:, :, None] * ncs
                + jnp.arange(ncs, dtype=sel.dtype)).reshape(nq, batch * ncs)
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
            self.postings.reshape(-1, cs), qrep, selb, valid, fmask, k,
            n_chunks,
        )


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "qcap", "lc")
)
def _inverted_probe_topk(metric, post_values, post_vsq, ok_post, qs, sel,
                         k: int, qcap: int, lc: int):
    """Query-grouped probe scan: (Q, B) probed list ids → per-query
    smallest-k (distances, virtual ids), where a virtual id is
    ``list·cap + slot`` (the caller translates to row ids with one final
    gather — no gathers run inside the scan loop, where this toolchain
    has miscompiled gather-behind-top_k fusions before).

    Steps:
    1. sort the (q → list) edge list by list; slot each edge into a
       (lists, qcap) query matrix (the device analogue of the reference's
       per-query pairingheap of probed lists, ivfscan.c:47-118).
    2. lax.scan over list chunks: dynamic_slice the chunk's value slabs
       (contiguous → streams at HBM bandwidth), one batched matmul against
       the chunk's probing queries, top-k per (list, query) over the slab.
    3. un-invert: per original edge, read back its (list, slot) top-k,
       regroup per query, merge.
    """
    nq, batch = sel.shape
    lists, cap, w = post_values.shape
    e = nq * batch
    # --- 1. invert --------------------------------------------------------
    l_of_e = sel.reshape(-1).astype(jnp.int32)
    eid = jnp.arange(e, dtype=jnp.int32)
    sl, se = jax.lax.sort((l_of_e, eid), num_keys=1)
    newrun = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sl[1:] != sl[:-1]])
    idx = jnp.arange(e, dtype=jnp.int32)
    pos = idx - jax.lax.cummax(jnp.where(newrun, idx, 0))
    edge_q = jnp.full((lists, qcap), -1, jnp.int32).at[sl, pos].set(
        se // batch, mode="drop")
    # inverse map: original edge → its slot position within its list
    _, pos_of_e = jax.lax.sort((se, pos), num_keys=1)

    # --- 2. chunked list scan --------------------------------------------
    if metric is Metric.L2:
        qsq = jnp.sum(qs.astype(jnp.float32) ** 2, axis=1)
    kk = min(k, cap)
    n_steps = lists // lc

    def step(carry, c):
        out_d, out_p = carry
        base = c * lc
        eq = jax.lax.dynamic_slice(edge_q, (base, 0), (lc, qcap))
        qv = qs[jnp.maximum(eq, 0)].astype(jnp.float32)  # (lc, qcap, D)
        vals = jax.lax.dynamic_slice(
            post_values, (base, 0, 0), (lc, cap, w)).astype(jnp.float32)
        okc = jax.lax.dynamic_slice(ok_post, (base, 0), (lc, cap))
        ip = jax.lax.dot_general(
            qv, vals,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=D.dot_precision(),
        )  # (lc, qcap, cap)
        if metric is Metric.L2:
            vsq = jax.lax.dynamic_slice(post_vsq, (base, 0), (lc, cap))
            qsq_c = qsq[jnp.maximum(eq, 0)]
            s = jnp.maximum(qsq_c[:, :, None] - 2.0 * ip + vsq[:, None, :],
                            0.0)
        else:  # IP / normalized-cosine order by -ip
            s = -ip
        s = jnp.where(okc[:, None, :], s, _IVF_BIG)
        rows_c = lc * qcap
        if cap >= 128 and kk * 64 < cap:
            # grouped selection: lax.top_k over the whole slab measured
            # 3.84 s/window at 1M — 12× the scoring matmul (0.32 s).
            # Reduce to per-64-slot minima (O(1)/element), top-k GROUPS
            # (exact: ≤ kk groups can hold the kk nearest), then refine
            # only kk·64 slots via a one-hot MXU select.
            G = 64
            ng = cap // G
            kg = min(kk, ng)
            sg = s.reshape(rows_c, ng, G)
            gm = jnp.min(sg, axis=2)
            _, gsel = jax.lax.top_k(-gm, kg)  # (R, kg) group ids
            onehot = (gsel[:, :, None]
                      == jnp.arange(ng, dtype=gsel.dtype)[None, None, :])
            ref = jax.lax.dot_general(
                onehot.astype(jnp.float32), sg,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (R, kg, G)
            neg2, j2 = jax.lax.top_k(-ref.reshape(rows_c, kg * G), kk)
            g_of = j2 // G
            gsel_pick = jnp.sum(
                jnp.where(g_of[:, :, None]
                          == jnp.arange(kg, dtype=j2.dtype)[None, None, :],
                          gsel[:, None, :], 0), axis=2)
            p = gsel_pick * G + j2 % G
            neg = neg2
        else:
            neg, p = jax.lax.top_k(-s.reshape(rows_c, cap), kk)
        d_sel = jnp.where(-neg >= _IVF_BIG, jnp.inf, -neg)
        if kk < k:
            d_sel = jnp.concatenate(
                [d_sel, jnp.full((rows_c, k - kk), jnp.inf, d_sel.dtype)],
                axis=1)
            p = jnp.concatenate(
                [p, jnp.zeros((rows_c, k - kk), p.dtype)], axis=1)
        d_blk = d_sel.reshape(lc, qcap, k)
        p_blk = p.reshape(lc, qcap, k).astype(jnp.int32)
        out_d = jax.lax.dynamic_update_slice(out_d, d_blk, (base, 0, 0))
        out_p = jax.lax.dynamic_update_slice(out_p, p_blk, (base, 0, 0))
        return (out_d, out_p), None

    init = (jnp.full((lists, qcap, k), jnp.inf, jnp.float32),
            jnp.full((lists, qcap, k), 0, jnp.int32))
    (out_d, out_p), _ = jax.lax.scan(
        step, init, jnp.arange(n_steps, dtype=jnp.int32))

    # --- 3. un-invert -----------------------------------------------------
    flat_idx = l_of_e * qcap + pos_of_e  # (E,)
    d_e = out_d.reshape(lists * qcap, k)[flat_idx]   # (E, k) row gather
    p_e = out_p.reshape(lists * qcap, k)[flat_idx]
    v_e = l_of_e[:, None] * cap + p_e                # virtual ids
    v_e = jnp.where(jnp.isinf(d_e), -1, v_e)
    d_q = d_e.reshape(nq, batch * k)
    v_q = v_e.reshape(nq, batch * k)
    negq, selq = jax.lax.top_k(-d_q, k)
    d_out = -negq
    # gather-free id pick (one-hot over batch·k — small)
    col = jnp.arange(batch * k, dtype=jnp.int32)
    hit = col[None, None, :] == selq[:, :, None]
    v_out = jnp.sum(jnp.where(hit, v_q[:, None, :], 0), axis=2)
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
