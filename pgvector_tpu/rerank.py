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
    best k (the outer ORDER BY of the re-rank CTE, README.md:600-607)."""
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


class BinaryQuantizedIndex:
    """Hamming HNSW over ``binary_quantize(embedding)`` with exact
    re-ranking — the pipeline of README.md:589-609.

    Build: pack sign bits of the dense table into a BitTable, index it with
    HNSW ``bit_hamming_ops``; query: quantize the query, over-fetch
    ``rerank_factor · k`` by Hamming, then re-rank with the true metric.
    """

    def __init__(self, table: DenseTable, metric: Metric = Metric.L2,
                 m: int = 16, ef_construction: int = 64,
                 rerank_factor: int = 4, seed: int = 0, **kw):
        from .index.hnsw import HNSWIndex

        self.table = table
        self.metric = metric
        self.rerank_factor = rerank_factor
        bits = np.asarray(table.data[: table.count]) > 0
        self.bit_table = BitTable(table.dim, capacity=max(table.count, 8))
        if table.count:
            rows = self.bit_table.insert(bits)
            dead = np.flatnonzero(~np.asarray(table.valid[: table.count]))
            if len(dead):
                self.bit_table.delete(dead)
        self.index = HNSWIndex(self.bit_table, Metric.HAMMING, m=m,
                               ef_construction=ef_construction, seed=seed,
                               dedup=False, **kw)

    def insert(self, rows) -> None:
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        bits = np.asarray(self.table.data[jnp.asarray(rows)]) > 0
        new_rows = self.bit_table.insert(bits)
        assert (new_rows == rows).all(), "bit shadow table out of sync"
        self.index.insert(new_rows)

    def search(self, q, k: int, ef_search: Optional[int] = None):
        qs = _coerce_dense_queries(q, self.table.dim)
        qbits = np.asarray(qs) > 0
        fetch = max(k * self.rerank_factor, k)
        _, cand = self.index.search(qbits, fetch,
                                    ef_search=ef_search or max(fetch, 40))
        return exact_rerank(self.table, self.metric, qs, cand, k)


class SubvectorIndex:
    """HNSW over ``subvector(v, 1, d')`` with full-width re-ranking —
    README.md:644-663.  Halves (or any prefix of) the indexed dimensions;
    recall recovered by over-fetching and exact re-scoring."""

    def __init__(self, table: DenseTable, metric: Metric = Metric.L2,
                 sub_dim: Optional[int] = None, m: int = 16,
                 ef_construction: int = 64, rerank_factor: int = 4,
                 seed: int = 0, **kw):
        from .index.hnsw import HNSWIndex

        self.table = table
        self.metric = metric
        self.sub_dim = sub_dim or max(table.dim // 2, 1)
        self.rerank_factor = rerank_factor
        sub = np.asarray(table.data[: table.count]).astype(np.float32)[:, : self.sub_dim]
        self.sub_table = DenseTable(self.sub_dim, capacity=max(table.count, 8))
        if table.count:
            self.sub_table.insert(sub)
            dead = np.flatnonzero(~np.asarray(table.valid[: table.count]))
            if len(dead):
                self.sub_table.delete(dead)
        self.index = HNSWIndex(self.sub_table, metric, m=m,
                               ef_construction=ef_construction, seed=seed, **kw)

    def insert(self, rows) -> None:
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        sub = np.asarray(self.table.data[jnp.asarray(rows)]).astype(np.float32)[:, : self.sub_dim]
        new_rows = self.sub_table.insert(sub)
        assert (new_rows == rows).all(), "subvector shadow table out of sync"
        self.index.insert(new_rows)

    def search(self, q, k: int, ef_search: Optional[int] = None):
        qs = np.asarray(_coerce_dense_queries(q, self.table.dim))
        fetch = max(k * self.rerank_factor, k)
        _, cand = self.index.search(qs[:, : self.sub_dim], fetch,
                                    ef_search=ef_search or max(fetch, 40))
        return exact_rerank(self.table, self.metric, qs, cand, k)
