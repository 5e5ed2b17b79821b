"""Re-ranking pipelines — the library form of pgvector's quantization
recipes (README.md:558-663):

- **fp16 indexing**: index an ``(embedding::halfvec(n))`` expression —
  here, a bf16/f16 DenseTable or an fp16 shadow of an f32 table.
- **binary quantization + re-rank** (README.md:589-609): Hamming-search a
  ``binary_quantize(embedding)`` index, then re-order the candidates by the
  exact distance on the original vectors.
- **subvector + re-rank** (README.md:644-663): index ``subvector(v, 1, d')``
  and re-rank full-width.

``exact_rerank`` is the shared second stage: gather candidate rows from the
source table and re-score with the exact operator distance.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .errors import DataException
from .index.flat import _coerce_dense_queries
from .ops import distance as D
from .ops.metric import Metric
from .ops.topk import topk_smallest
from .store.table import BitTable, DenseTable


def exact_rerank(
    table: DenseTable,
    metric: Metric,
    q,
    candidate_ids: np.ndarray,  # (Q, C) row ids, -1 padded
    k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Re-score candidates with the exact operator distance and keep the
    best k (the outer ORDER BY of the re-rank CTE, README.md:600-607).

    Zero-norm rows (or a zero query) under COSINE score +inf and are
    emitted as absent slots (-1/inf) — the framework-wide convention for
    "no defined distance", consistent with FlatIndex and with cosine
    indexes skipping zero vectors; the reference's exact scan would
    instead order those rows last with NaN distances."""
    qs = _coerce_dense_queries(q, table.dim)
    cand = jnp.asarray(np.asarray(candidate_ids, np.int32))
    safe = jnp.maximum(cand, 0)
    vecs = table.data[safe]  # (Q, C, D)
    qf = qs[:, None, :]
    vf = vecs.astype(jnp.float32)
    if metric is Metric.L2:
        s = jnp.sum((qf - vf) ** 2, axis=-1)
    elif metric is Metric.IP:
        s = -jnp.sum(qf * vf, axis=-1)
    elif metric is Metric.COSINE:
        ip = jnp.sum(qf * vf, axis=-1)
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1))
        vn = jnp.sqrt(jnp.sum(vf * vf, axis=-1))
        denom = qn * vn
        s = 1.0 - jnp.where(denom > 0, ip / jnp.where(denom > 0, denom, 1.0), -jnp.inf)
    elif metric is Metric.L1:
        s = jnp.sum(jnp.abs(qf - vf), axis=-1)
    else:
        raise DataException(f"operator {metric.op} does not apply to dense re-ranking")
    ok = cand >= 0
    ok = ok & table.valid[safe]
    s = jnp.where(ok, s, jnp.inf)
    d, i = topk_smallest(s, min(k, s.shape[1]), ids=cand)
    i = jnp.where(jnp.isinf(d), -1, i)
    if metric is Metric.L2:
        d = jnp.where(jnp.isinf(d), d, jnp.sqrt(jnp.maximum(d, 0.0)))
    return np.asarray(d), np.asarray(i)


class ExpressionIndex:
    """General expression index — ``CREATE INDEX ON t ((expr(v)))``
    (README.md:558-569 uses it for halfvec casts; any row-wise derivation
    qualifies).  Maintains a shadow table of ``expr(value)`` plus an
    explicit shadow-row ↔ source-row mapping, so inserts arriving in any
    order — including after deletes and slot reuse on the source — stay
    consistent (the earlier pipelines *asserted* id equality and crashed
    on out-of-order inserts).

    ``expr`` maps an (R, dim) f32 block of source rows to shadow values
    (float array → DenseTable shadow; bool array → BitTable shadow);
    ``qexpr`` (default: ``expr``) maps coerced queries the same way.
    ``search`` runs the shadow index, maps ids back to source rows, and —
    when ``rerank`` — re-scores with the exact source-metric distance
    (the outer ORDER BY of the re-rank CTE, README.md:600-607)."""

    def __init__(self, table: DenseTable, expr, metric: Metric = Metric.L2,
                 shadow_metric: Optional[Metric] = None, qexpr=None,
                 rerank: bool = True, rerank_factor: int = 4,
                 m: int = 16, ef_construction: int = 64, seed: int = 0,
                 **kw):
        from .index.hnsw import HNSWIndex

        self.table = table
        self.expr = expr
        self.qexpr = qexpr or expr
        self.metric = metric
        self.rerank = rerank
        self.rerank_factor = rerank_factor
        self._src_of_shadow = np.zeros(0, np.int64)
        live = np.flatnonzero(np.asarray(table.valid[: table.count]))
        sample = self.expr(np.zeros((1, table.dim), np.float32))
        sample = np.asarray(sample)
        if sample.dtype == bool:
            self.shadow = BitTable(sample.shape[1],
                                   capacity=max(table.count, 8))
            shadow_metric = shadow_metric or Metric.HAMMING
            kw.setdefault("dedup", False)
        else:
            self.shadow = DenseTable(sample.shape[1],
                                     capacity=max(table.count, 8))
            shadow_metric = shadow_metric or metric
        if len(live):
            vals = np.asarray(self.expr(
                np.asarray(table.data[jnp.asarray(live)], np.float32)))
            srows = self.shadow.insert(vals)
            self._map_rows(srows, live)
        self.index = HNSWIndex(self.shadow, shadow_metric, m=m,
                               ef_construction=ef_construction, seed=seed,
                               **kw)

    def _map_rows(self, shadow_rows: np.ndarray, src_rows: np.ndarray) -> None:
        hi = int(shadow_rows.max(initial=-1)) + 1
        if hi > len(self._src_of_shadow):
            grown = np.full(max(hi, 2 * len(self._src_of_shadow), 8), -1,
                            np.int64)
            grown[: len(self._src_of_shadow)] = self._src_of_shadow
            self._src_of_shadow = grown
        self._src_of_shadow[shadow_rows] = src_rows

    def insert(self, rows) -> None:
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        vals = np.asarray(self.expr(
            np.asarray(self.table.data[jnp.asarray(rows)], np.float32)))
        srows = self.shadow.insert(vals)
        self._map_rows(np.asarray(srows, np.int64), rows)
        self.index.insert(srows)

    def vacuum(self) -> None:
        """Propagate source deletes to the shadow, then repair the shadow
        index — no id-alignment assumption."""
        src_valid = np.asarray(self.table.valid)
        n_sh = self.shadow.count
        srcs = self._src_of_shadow[:n_sh]
        sh_valid = np.asarray(self.shadow.valid[:n_sh])
        dead_sh = np.flatnonzero(
            sh_valid & ((srcs < 0) | ~src_valid[np.maximum(srcs, 0)]))
        if len(dead_sh):
            self.shadow.delete(dead_sh)
        self.index.vacuum()

    def search(self, q, k: int, ef_search: Optional[int] = None):
        qs = np.asarray(_coerce_dense_queries(q, self.table.dim))
        qv = np.asarray(self.qexpr(qs))
        fetch = max(k * self.rerank_factor, k) if self.rerank else k
        # derived ef must stay inside the hnsw.ef_search GUC range (1..1000,
        # validated by HNSWIndex.search) — k=251 at rerank_factor=4 would
        # otherwise derive ef 1004 and raise; an EXPLICIT out-of-range
        # ef_search still errors like any SET would
        d, cand = self.index.search(qv, fetch,
                                    ef_search=ef_search
                                    or min(max(fetch, 40), 1000))
        # shadow rows → source rows (also drops shadows of deleted sources)
        safe = np.maximum(cand, 0)
        src = np.where(cand >= 0, self._src_of_shadow[safe], -1)
        src_valid = np.asarray(self.table.valid)
        src = np.where((src >= 0) & src_valid[np.maximum(src, 0)], src, -1)
        if not self.rerank:
            # shadow distances pair with the mapped ids; a candidate whose
            # source row is gone keeps id -1 and must not surface a finite
            # distance
            return np.where(src[:, :k] >= 0, d[:, :k], np.inf), src[:, :k]
        return exact_rerank(self.table, self.metric, qs, src, k)


class BinaryQuantizedIndex(ExpressionIndex):
    """Hamming HNSW over ``binary_quantize(embedding)`` with exact
    re-ranking — the pipeline of README.md:589-609, as an ExpressionIndex
    with ``expr = binary_quantize`` (sign bits → BitTable shadow)."""

    def __init__(self, table: DenseTable, metric: Metric = Metric.L2,
                 m: int = 16, ef_construction: int = 64,
                 rerank_factor: int = 4, seed: int = 0, **kw):
        super().__init__(table, expr=lambda v: v > 0, metric=metric,
                         shadow_metric=Metric.HAMMING, m=m,
                         ef_construction=ef_construction,
                         rerank_factor=rerank_factor, seed=seed, **kw)

    @property
    def bit_table(self) -> BitTable:  # backward-compat alias
        return self.shadow


class SubvectorIndex(ExpressionIndex):
    """HNSW over ``subvector(v, 1, d')`` with full-width re-ranking —
    README.md:644-663, as an ExpressionIndex with a prefix-slice expr."""

    def __init__(self, table: DenseTable, metric: Metric = Metric.L2,
                 sub_dim: Optional[int] = None, m: int = 16,
                 ef_construction: int = 64, rerank_factor: int = 4,
                 seed: int = 0, **kw):
        sd = sub_dim or max(table.dim // 2, 1)
        super().__init__(table, expr=lambda v: v[:, :sd], metric=metric,
                         m=m, ef_construction=ef_construction,
                         rerank_factor=rerank_factor, seed=seed, **kw)
        self.sub_dim = sd

    @property
    def sub_table(self) -> DenseTable:  # backward-compat alias
        return self.shadow
