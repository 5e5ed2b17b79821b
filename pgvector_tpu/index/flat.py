"""Exact (brute-force) search — pgvector's no-index path and the ground
truth for every recall test (README.md:197; test/t/012 methodology).

A flat scan over the table's HBM arrays: tiled MXU score blocks merged into
a running top-k (ops.topk.tiled_topk).  Matches the reference's "parallel
exact search" capability (SURVEY.md §2.4.4) — on TPU the parallel seq scan
+ Gather becomes data-parallel tiles on one chip and shard-parallel scans
across a mesh (pgvector_tpu.parallel).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import DataException
from ..ops import distance as D
from ..ops.metric import Metric
from ..ops.topk import grouped_exact_topk, tiled_topk
from ..store.table import BitTable, DenseTable, SparseTable
from ..utils.stats import ScanStats
from ..types import Bit, HalfVec, SparseVec, Vector


def _exact_mode() -> str:
    """Dense exact engine (PGVECTOR_TPU_EXACT): ``grouped`` (default —
    group-min filter + refine, O(1) selection work per element),
    ``pallas`` (fused kernel), or ``xla`` (tiled lax.top_k merge)."""
    import os

    return os.environ.get("PGVECTOR_TPU_EXACT", "grouped")

DENSE_METRICS = (Metric.L2, Metric.IP, Metric.COSINE, Metric.L1)
BIT_METRICS = (Metric.HAMMING, Metric.JACCARD)
SPARSE_METRICS = (Metric.L2, Metric.IP, Metric.COSINE, Metric.L1)


def _coerce_dense_queries(q, dim: int) -> jnp.ndarray:
    if isinstance(q, (Vector, HalfVec)):
        q = q.x[None, :]
    elif isinstance(q, (list, tuple)) and q and isinstance(q[0], (Vector, HalfVec)):
        q = np.stack([v.x for v in q])
    arr = jnp.asarray(np.asarray(q, dtype=np.float32))
    if arr.ndim == 1:
        arr = arr[None, :]
    if arr.shape[1] != dim:
        raise DataException(f"different vector dimensions {arr.shape[1]} and {dim}")
    return arr


def _dense_row_scores(metric: Metric, qs: jnp.ndarray,
                      v: jnp.ndarray) -> jnp.ndarray:
    """(Q, C) stored distances for per-query candidate rows — the same
    formulation as ops.distance.dense_scores (stored L2 is squared;
    cosine over raw norms), batched per query for the refine stage."""
    qf = qs.astype(jnp.float32)
    ip = jnp.einsum("qcd,qd->qc", v, qf,
                    precision=D.dot_precision())
    if metric is Metric.IP:
        return -ip
    v_sq = jnp.sum(v * v, axis=-1)
    if metric is Metric.L2:
        q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)
        return jnp.maximum(q_sq - 2.0 * ip + v_sq, 0.0)
    q_n = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))
    denom = q_n * jnp.sqrt(v_sq)
    sim = jnp.where(denom > 0, ip / jnp.where(denom > 0, denom, 1.0), -jnp.inf)
    return jnp.where(denom > 0, 1.0 - jnp.clip(sim, -1.0, 1.0), jnp.inf)


import functools


@functools.partial(jax.jit, static_argnames=("metric", "n", "k", "group"))
def _grouped_dense(metric, qs, data, valid, n: int, k: int, group: int):
    def score_tile(tile_data):
        return D.dense_scores(metric, qs, tile_data)

    def score_rows(cand):
        v = data[cand].astype(jnp.float32)  # (Q, C, D)
        return _dense_row_scores(metric, qs, v)

    return grouped_exact_topk(score_tile, score_rows, (data,), n, k,
                              group=group, valid=valid)


def _grouped_group_size(n: int, nq: int) -> int:
    """Group width balancing the (Q, N/group) group-min matrix (≤ ~1.5 GB)
    against refine-gather volume (k·group rows per query)."""
    g = 16
    while g < 1024 and (n // g) * nq * 4 > 15 * 2**27:
        g *= 2
    return g


class FlatIndex:
    """Exact top-k over a table.  Stateless w.r.t. the table's contents —
    always sees the current rows + validity mask.

    ``last_path`` records which engine served the previous dense search
    ("pallas" or "xla") — the remote Mosaic compile service is flaky, and a
    silent fallback once turned a 39 s ground-truth pass into 291 s with no
    signal (BENCH_r02).  Failures now log through ``notice_hook`` and the
    Pallas path retries once before falling back."""

    def __init__(self, table: Union[DenseTable, BitTable, SparseTable],
                 metric: Metric, tile: int = 8192, notice_hook=None):
        self.table = table
        self.metric = metric
        self.tile = tile
        self.notice_hook = notice_hook or (lambda msg: None)
        #: pg_stat observability analogue (utils/stats.py)
        self.stats = ScanStats()
        self.last_path: str = ""
        if isinstance(table, DenseTable) and metric not in DENSE_METRICS:
            raise DataException(f"operator {metric.op} does not apply to dense vectors")
        if isinstance(table, BitTable) and metric not in BIT_METRICS:
            raise DataException(f"operator {metric.op} does not apply to bit vectors")
        if isinstance(table, SparseTable) and metric not in SPARSE_METRICS:
            raise DataException(f"operator {metric.op} does not apply to sparse vectors")

    def _valid(self, fmask):
        """Live-row mask over the first ``count`` rows, ANDed with an
        optional caller filter (capacity- or count-sized)."""
        v = self.table.valid[: self.table.count]
        if fmask is not None:
            v = v & jnp.asarray(fmask, dtype=bool)[: self.table.count]
        return v

    # -- dense -------------------------------------------------------------
    def _search_dense(self, q, k: int, fmask=None):
        table: DenseTable = self.table
        qs = _coerce_dense_queries(q, table.dim)
        metric = self.metric

        from ..ops import pallas_topk

        mode = _exact_mode()
        if (mode == "grouped" and table.count >= 4096
                and metric in (Metric.L2, Metric.IP, Metric.COSINE)):
            # group-min filter + refine: per-element work is one min-lane op
            # (XLA fuses it into the matmul consumer), so the scan runs at
            # matmul/HBM speed instead of top-k-merge speed — the per-tile
            # selection merges dominate the matmul ~100× at 1M×4000q
            self.last_path = "grouped"
            return _grouped_dense(metric, qs, table.data,
                                  self._valid(fmask),
                                  table.count, k,
                                  _grouped_group_size(table.count,
                                                      qs.shape[0]))
        if (mode != "xla" and pallas_topk.supported(metric, table.dtype)
                and table.dtype == jnp.float32 and table.count >= 4096
                and k <= 64):
            # fused Pallas path: matmul + in-VMEM top-k, DB streamed by the
            # grid pipeline (no (Q, N) score block in HBM).  Fail-safe: one
            # retry (the remote Mosaic compile service intermittently 500s
            # on kernels it compiled fine minutes earlier), then a LOGGED
            # fallback to the XLA scan — never a silent one.
            for attempt in (1, 2):
                try:
                    out = pallas_topk.exact_topk(
                        metric, qs, table.data[: table.count], k,
                        valid=self._valid(fmask),
                    )
                    self.last_path = "pallas"
                    return out
                except Exception as exc:  # noqa: BLE001 — any device error
                    self.notice_hook(
                        f"exact-search Pallas path failed "
                        f"(attempt {attempt}/2): {type(exc).__name__}: {exc}"
                    )
            self.notice_hook(
                "exact-search falling back to the XLA tiled scan"
            )
        self.last_path = "xla"

        def score(tile_data):
            return D.dense_scores(metric, qs, tile_data)

        return tiled_topk(
            score, (table.data,), table.count, k,
            tile=self.tile, valid=self._valid(fmask),
        )

    # -- bit ---------------------------------------------------------------
    def _search_bit(self, q, k: int, fmask=None):
        table: BitTable = self.table
        if isinstance(q, Bit):
            q = q.bits[None, :]
        elif isinstance(q, (list, tuple)) and q and isinstance(q[0], Bit):
            q = np.stack([b.bits for b in q])
        arr = np.asarray(q, dtype=bool)
        if arr.ndim == 1:
            arr = arr[None, :]
        if arr.shape[1] != table.dim:
            raise DataException(
                f"different bit lengths {arr.shape[1]} and {table.dim}"
            )
        qw = D.pack_bits(jnp.asarray(arr))
        metric = self.metric

        def score(tile_words):
            return D.bit_scores(metric, qw, tile_words)

        return tiled_topk(
            score, (table.data,), table.count, k,
            tile=self.tile, valid=self._valid(fmask),
        )

    # -- sparse ------------------------------------------------------------
    def _sparse_densified(self) -> jnp.ndarray:
        """Dense f32 [count, dim] copy of the sparse table, cached ON THE
        TABLE (product paths build a fresh FlatIndex per query, so an
        index-held cache would re-densify every call).

        Tables are functionally updated (every insert/vacuum replaces the
        idx/val arrays), so array object identity keys table content; the
        validity mask is NOT in the key — deletes don't change the dense
        values, and `valid` is passed fresh to the engine.  Host-side
        vectorized scatter — TPU scatters are slow and the copy is
        one-time per table state."""
        table: SparseTable = self.table
        key = (id(table.idx), id(table.val), table.count)
        cached = getattr(table, "_dense_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        idx = np.asarray(table.idx[: table.count])
        val = np.asarray(table.val[: table.count])
        dense = np.zeros((table.count, table.dim), dtype=np.float32)
        live = idx < table.pad_index
        rows = np.broadcast_to(
            np.arange(table.count, dtype=np.int64)[:, None], idx.shape
        )
        dense[rows[live], idx[live]] = val[live]
        data = jnp.asarray(dense)
        table._dense_cache = (key, data)
        return data

    def _search_sparse(self, q, k: int, fmask=None):
        table: SparseTable = self.table
        if isinstance(q, SparseVec):
            q = [q]
        for sv in q:
            if sv.dim != table.dim:
                raise DataException(
                    f"different sparsevec dimensions {sv.dim} and {table.dim}"
                )
        metric = self.metric
        import os

        # Densified fast path: scores via one MXU matmul sweep (grouped
        # engine).  The merge-join kernel vmapped over thousands of queries
        # materializes [Q, tile, nnz] gathers that lane-pad 4x (35 GB at
        # 4000q x 8192 x 32 — a measured compile-time OOM); dense rows keep
        # the exact same L2/IP/cosine values (dropped zeros are zeros).
        budget = float(os.environ.get("PGVECTOR_TPU_SPARSE_DENSIFY_GB", "8"))
        dense_bytes = table.count * table.dim * 4
        if (metric in (Metric.L2, Metric.IP, Metric.COSINE)
                and table.count >= 4096 and dense_bytes <= budget * 2**30):
            qs = np.zeros((len(q), table.dim), dtype=np.float32)
            for r, sv in enumerate(q):
                qs[r, sv.indices] = sv.values
            self.last_path = "grouped-densified"
            return _grouped_dense(
                metric, jnp.asarray(qs), self._sparse_densified(),
                self._valid(fmask), table.count, k,
                _grouped_group_size(table.count, len(q)),
            )

        # Densified-TILE path (L2/IP/cosine beyond the full-copy budget):
        # the vmapped merge-join kernel at [chunk, tile, nnz] shapes has
        # hard-crashed this image's axon worker (kernel fault, reproduced
        # twice on the 1M×4096-d GT lane) — and a device-side
        # scatter-densify per tile + one MXU matmul is faster anyway.
        # Tile rows are sized so the dense [tile, dim] f32 temp stays
        # under PGVECTOR_TPU_SPARSE_TILE_BYTES (default 512 MB); below
        # 512 rows/tile (dim ≳ 250k) the merge-join path wins again.
        if metric in (Metric.L2, Metric.IP, Metric.COSINE):
            tile_budget = int(os.environ.get(
                "PGVECTOR_TPU_SPARSE_TILE_BYTES", str(512 << 20)))
            t_rows = min(max(tile_budget // (table.dim * 4), 1), self.tile)
            t_rows = 1 << (int(t_rows).bit_length() - 1)  # floor pow2
            if t_rows >= 512:
                qs = np.zeros((len(q), table.dim), dtype=np.float32)
                for r, sv in enumerate(q):
                    qs[r, sv.indices] = sv.values
                qs_dev = jnp.asarray(qs)
                pad_i = table.pad_index
                dim = table.dim
                self.last_path = "densified-tile"

                def score(tile_idx, tile_val):
                    t = tile_idx.shape[0]
                    rows = jnp.broadcast_to(
                        jnp.arange(t, dtype=jnp.int32)[:, None],
                        tile_idx.shape)
                    ok = tile_idx < pad_i
                    cols = jnp.where(ok, tile_idx, 0).astype(jnp.int32)
                    vals = jnp.where(ok, tile_val, jnp.float32(0))
                    dense = jnp.zeros((t, dim), jnp.float32)
                    dense = dense.at[rows, cols].add(vals)
                    return D.dense_scores(metric, qs_dev, dense)

                return tiled_topk(
                    score, (table.idx, table.val), table.count, k,
                    tile=t_rows, valid=self._valid(fmask),
                )

        pq = max(max((sv.nnz for sv in q), default=1), 1)
        q_idx = np.full((len(q), pq), table.pad_index, dtype=np.int32)
        q_val = np.zeros((len(q), pq), dtype=np.float32)
        for r, sv in enumerate(q):
            q_idx[r, : sv.nnz] = sv.indices
            q_val[r, : sv.nnz] = sv.values
        self.last_path = "xla-sparse"

        # Bound the [chunk, tile, nnz] merge-join temps: lane padding
        # expands nnz to 128, so a full 4000-query batch is a compile-time
        # OOM; ≤256-query chunks keep temps ~2 GB at tile 8192.
        chunk = max(1, int(os.environ.get("PGVECTOR_TPU_SPARSE_CHUNK", "256")))
        outs = []
        for s in range(0, len(q), chunk):
            ci = jnp.asarray(q_idx[s : s + chunk])
            cv = jnp.asarray(q_val[s : s + chunk])

            def score(tile_idx, tile_val, ci=ci, cv=cv):
                return D.sparse_scores_batch(metric, ci, cv, tile_idx, tile_val)

            outs.append(tiled_topk(
                score, (table.idx, table.val), table.count, k,
                tile=self.tile, valid=self._valid(fmask),
            ))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    def search(self, q, k: int,
               filter_mask=None) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k.  Returns (distances, row_ids) with user-facing
        operator distances; absent slots (k > live rows) give inf / -1.
        ``filter_mask`` restricts results to rows where it is True (the
        WHERE-clause analogue every index path also accepts)."""
        if isinstance(self.table, DenseTable):
            stored, ids = self._search_dense(q, k, filter_mask)
        elif isinstance(self.table, BitTable):
            stored, ids = self._search_bit(q, k, filter_mask)
        else:
            stored, ids = self._search_sparse(q, k, filter_mask)
        if self.metric is Metric.L2:
            user = jnp.where(jnp.isinf(stored), stored, jnp.sqrt(jnp.maximum(stored, 0.0)))
        else:
            user = stored
        user, ids = np.asarray(user), np.asarray(ids)
        self.stats.count(len(ids), ids)
        return user, ids
