"""Exact search vs numpy brute force — every (table type × metric) combo.

Ports the ground-truth methodology of the reference recall tests
(test/t/012:13-47): exact top-k from a seq scan is the oracle; here the
oracle itself is validated against a float64 numpy computation.
"""

import os

import numpy as np
import pytest

from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import BitTable, DenseTable, SparseTable
from pgvector_tpu.types import Bit, SparseVec


def np_dense_dist(metric, q, db):
    q = q.astype(np.float64)
    db = db.astype(np.float64)
    if metric is Metric.L2:
        return np.linalg.norm(q[:, None, :] - db[None, :, :], axis=-1)
    if metric is Metric.IP:
        return -(q @ db.T)
    if metric is Metric.COSINE:
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        dn = np.linalg.norm(db, axis=1, keepdims=True)
        return 1 - (q @ db.T) / (qn * dn.T)
    if metric is Metric.L1:
        return np.abs(q[:, None, :] - db[None, :, :]).sum(-1)
    raise ValueError(metric)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE, Metric.L1])
def test_dense_exact(metric, rng):
    n, d, nq, k = 500, 33, 7, 10
    db = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    table = DenseTable(d)
    table.insert(db)
    idx = FlatIndex(table, metric, tile=128)
    dists, ids = idx.search(q, k)
    ref = np_dense_dist(metric, q, db)
    ref_ids = np.argsort(ref, axis=1)[:, :k]
    for i in range(nq):
        # compare distance values (ids can differ on exact ties)
        assert np.allclose(np.sort(dists[i]), np.sort(ref[i, ref_ids[i]]), rtol=2e-3, atol=2e-3)
        # and at least 9/10 of the ids agree
        assert len(set(ids[i]) & set(ref_ids[i])) >= k - 1


def test_dense_deletes(rng):
    n, d = 100, 8
    db = rng.normal(size=(n, d)).astype(np.float32)
    table = DenseTable(d)
    table.insert(db)
    idx = FlatIndex(table, Metric.L2, tile=32)
    q = db[5][None, :]
    dists, ids = idx.search(q, 1)
    assert ids[0, 0] == 5 and dists[0, 0] < 1e-2  # matmul-form L2 has ~1e-3 residual
    table.delete([5])
    dists, ids = idx.search(q, 1)
    assert ids[0, 0] != 5


def test_k_exceeds_rows(rng):
    table = DenseTable(4)
    table.insert(rng.normal(size=(3, 4)).astype(np.float32))
    idx = FlatIndex(table, Metric.L2)
    dists, ids = idx.search(np.zeros((1, 4), np.float32), 8)
    assert (ids[0, 3:] == -1).all()
    assert np.isinf(dists[0, 3:]).all()


@pytest.mark.parametrize("metric", [Metric.HAMMING, Metric.JACCARD])
def test_bit_exact(metric, rng):
    n, d, nq, k = 300, 70, 5, 7
    db = rng.random((n, d)) < 0.5
    q = rng.random((nq, d)) < 0.5
    table = BitTable(d)
    table.insert(db)
    idx = FlatIndex(table, metric, tile=64)
    dists, ids = idx.search(q, k)
    for i in range(nq):
        if metric is Metric.HAMMING:
            ref = (q[i][None, :] != db).sum(1).astype(float)
        else:
            ab = (q[i][None, :] & db).sum(1)
            union = q[i].sum() + db.sum(1) - ab
            ref = np.where(ab == 0, 1.0, 1 - ab / np.maximum(union, 1))
        order = np.argsort(ref)[:k]
        assert np.allclose(np.sort(dists[i]), np.sort(ref[order]), atol=1e-6)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE, Metric.L1])
def test_sparse_exact(metric, rng):
    n, d, nq, k = 200, 50, 4, 5
    dense_db = (rng.normal(size=(n, d)) * (rng.random((n, d)) < 0.3)).astype(np.float32)
    dense_db[0] = 0  # an all-zero row
    dense_q = (rng.normal(size=(nq, d)) * (rng.random((nq, d)) < 0.3)).astype(np.float32)
    table = SparseTable(d, nnz_cap=64)
    table.insert([SparseVec.from_dense(r) for r in dense_db])
    idx = FlatIndex(table, metric, tile=64)
    queries = [SparseVec.from_dense(r) for r in dense_q]
    dists, ids = idx.search(queries, k)
    ref = np_dense_dist(metric, dense_q, dense_db)
    if metric is Metric.COSINE:
        ref = np.where(np.isnan(ref), np.inf, ref)  # zero rows sort last
    for i in range(nq):
        order = np.argsort(ref[i])[:k]
        assert np.allclose(np.sort(dists[i]), np.sort(ref[i, order]), rtol=1e-4, atol=1e-4)


def test_metric_type_mismatch(rng):
    from pgvector_tpu.errors import DataException

    with pytest.raises(DataException, match="does not apply"):
        FlatIndex(DenseTable(4), Metric.HAMMING)
    with pytest.raises(DataException, match="does not apply"):
        FlatIndex(BitTable(4), Metric.L2)


def test_grouped_exact_matches_tiled():
    """The grouped (filter+refine) exact engine must agree with the tiled
    merge engine — same distances, same rows up to ties — for every dense
    metric, with deletes."""
    import os

    from pgvector_tpu.index import flat as flat_mod

    rng = np.random.default_rng(77)
    db = rng.normal(size=(9000, 24)).astype(np.float32)
    q = rng.normal(size=(30, 24)).astype(np.float32)
    table = DenseTable(24)
    rows = table.insert(db)
    table.delete(rows[::11])
    for metric in (Metric.L2, Metric.IP, Metric.COSINE):
        f = FlatIndex(table, metric)
        old = os.environ.get("PGVECTOR_TPU_EXACT")
        try:
            os.environ["PGVECTOR_TPU_EXACT"] = "grouped"
            d_g, i_g = f.search(q, 10)
            assert f.last_path == "grouped"
            os.environ["PGVECTOR_TPU_EXACT"] = "xla"
            d_x, i_x = f.search(q, 10)
            assert f.last_path == "xla"
        finally:
            if old is None:
                os.environ.pop("PGVECTOR_TPU_EXACT", None)
            else:
                os.environ["PGVECTOR_TPU_EXACT"] = old
        assert np.allclose(d_g, d_x, rtol=1e-4, atol=1e-4), metric
        # identical rows wherever distances are distinct (ties may swap)
        for a, b, dd in zip(i_g, i_x, d_g):
            uniq = len(np.unique(np.round(dd[np.isfinite(dd)], 5)))
            if uniq == np.isfinite(dd).sum():
                assert set(a[a >= 0]) == set(b[b >= 0]), metric
        # deleted rows never surface
        assert not np.isin(i_g, rows[::11]).any()


def test_grouped_exact_small_and_k_edge():
    rng = np.random.default_rng(78)
    db = rng.normal(size=(5000, 8)).astype(np.float32)
    table = DenseTable(8)
    table.insert(db)
    f = FlatIndex(table, Metric.L2)
    d, i = f.search(db[:3], 4999)  # k larger than k*group coverage
    # grouped path only guarantees k ≤ covered candidates; the engine must
    # still return exact nearest for the FIRST k·group positions — here we
    # just check the top hit and monotone ordering
    assert (i[:, 0] == np.arange(3)).all()
    fin = d[0][np.isfinite(d[0])]
    assert np.all(np.diff(fin) >= 0)


def test_sparse_densified_matches_merge_join():
    """The densified sparse engine (MXU matmul over a host-scattered dense
    copy) must agree with the merge-join kernel — same rows, same distances
    to f32 rounding — and the merge-join path must chunk queries (the
    un-chunked [Q, tile, nnz] form lane-pads 4x and OOMs compiles at
    4000 queries, BENCH_NOTES round-3 session 3)."""
    rng = np.random.default_rng(17)
    n, dim, nnz, nq, k = 5000, 256, 12, 23, 8
    # distinct sorted indices per row (duplicates are invalid sparsevec
    # input and the engines may legitimately disagree on them)
    raw = np.sort(
        np.argpartition(rng.random((n + nq, dim)), nnz, axis=1)[:, :nnz], axis=1
    ).astype(np.int32)
    vals = rng.normal(size=(n + nq, nnz)).astype(np.float32)
    vals[vals == 0] = 1.0
    table = SparseTable(dim, nnz_cap=nnz, capacity=n)
    table.insert([SparseVec(dim, raw[i], vals[i], _checked=True) for i in range(n)])
    queries = [SparseVec(dim, raw[n + i], vals[n + i], _checked=True) for i in range(nq)]
    for metric in (Metric.L2, Metric.IP, Metric.COSINE):
        f_dense = FlatIndex(table, metric)
        d_d, i_d = f_dense.search(queries, k)
        assert f_dense.last_path == "grouped-densified"
        old_b = os.environ.get("PGVECTOR_TPU_SPARSE_DENSIFY_GB")
        old_c = os.environ.get("PGVECTOR_TPU_SPARSE_CHUNK")
        old_t = os.environ.get("PGVECTOR_TPU_SPARSE_TILE_BYTES")
        try:
            os.environ["PGVECTOR_TPU_SPARSE_DENSIFY_GB"] = "0"
            # densified-TILE engine (device-side scatter per tile + MXU
            # matmul — the path the axon merge-join worker crash forced
            # for 1M×4096-d ground truth)
            f_dt = FlatIndex(table, metric, tile=1024)  # force tile seams
            d_t, i_t = f_dt.search(queries, k)
            assert f_dt.last_path == "densified-tile"
            os.environ["PGVECTOR_TPU_SPARSE_TILE_BYTES"] = "0"
            os.environ["PGVECTOR_TPU_SPARSE_CHUNK"] = "7"  # force chunk seams
            f_mj = FlatIndex(table, metric)
            d_m, i_m = f_mj.search(queries, k)
            assert f_mj.last_path == "xla-sparse"
        finally:
            for key, old in (("PGVECTOR_TPU_SPARSE_DENSIFY_GB", old_b),
                             ("PGVECTOR_TPU_SPARSE_CHUNK", old_c),
                             ("PGVECTOR_TPU_SPARSE_TILE_BYTES", old_t)):
                if old is None:
                    os.environ.pop(key, None)
                else:
                    os.environ[key] = old
        assert np.allclose(d_d, d_m, rtol=1e-4, atol=1e-4), metric
        assert np.allclose(d_d, d_t, rtol=1e-4, atol=1e-4), metric
        for a, b, c, dd in zip(i_d, i_m, i_t, d_d):
            uniq = len(np.unique(np.round(dd[np.isfinite(dd)], 5)))
            if uniq == np.isfinite(dd).sum():
                assert set(a[a >= 0]) == set(b[b >= 0]), metric
                assert set(a[a >= 0]) == set(c[c >= 0]), metric
    # cache invalidation: a mutation must drop the stale dense copy
    f = FlatIndex(table, Metric.L2)
    f.search(queries[:2], k)
    extra = SparseVec(dim, np.asarray(raw[n], np.int32), vals[n] + 5.0, _checked=True)
    row = table.insert([extra])[0]
    d2, i2 = f.search([extra], 1)
    assert i2[0, 0] == row and d2[0, 0] < 1e-3


def test_sparse_densify_cache_shared_across_indexes():
    """The dense copy caches on the TABLE: product paths (Relation.knn)
    build a fresh FlatIndex per query, and deletes must NOT invalidate
    (the dense values don't depend on the validity mask)."""
    rng = np.random.default_rng(31)
    n, dim, nnz = 5000, 128, 8
    raw = np.sort(
        np.argpartition(rng.random((n, dim)), nnz, axis=1)[:, :nnz], axis=1
    ).astype(np.int32)
    vals = rng.normal(size=(n, nnz)).astype(np.float32)
    vals[vals == 0] = 1.0
    table = SparseTable(dim, nnz_cap=nnz, capacity=n)
    rows = table.insert([SparseVec(dim, raw[i], vals[i], _checked=True)
                         for i in range(n)])
    q = [SparseVec(dim, raw[0], vals[0], _checked=True)]
    f1 = FlatIndex(table, Metric.L2)
    f1.search(q, 5)
    cached = table._dense_cache[1]
    f2 = FlatIndex(table, Metric.L2)
    f2.search(q, 5)
    assert table._dense_cache[1] is cached  # cross-instance hit
    table.delete(rows[:3])
    d, i = f2.search(q, 5)
    assert table._dense_cache[1] is cached  # delete does not re-densify
    assert not np.isin(i, rows[:3]).any()   # but deleted rows never surface


def test_grouped_refine_chunked_is_exact(monkeypatch):
    """Large k·group candidate sets are re-scored in bounded chunks with a
    running top-k merge (the unchunked gather is O(Q·k·group·D) — tens of
    GB at k=100/group=128).  Chunking must not change the result: the
    top-k of a union is contained in the union of per-chunk top-ks."""
    from pgvector_tpu.ops import topk as topk_mod

    # ~4 KB budget forces many chunks at this (Q, D); distinct (n, k) from
    # other tests so the jitted engine re-traces under the patched budget
    monkeypatch.setattr(topk_mod, "REFINE_BYTES", 4096)
    rng = np.random.default_rng(79)
    db = rng.normal(size=(9100, 24)).astype(np.float32)
    table = DenseTable(24)
    rows = table.insert(db)
    table.delete(rows[::13])
    f = FlatIndex(table, Metric.L2)
    d, i = f.search(db[:8], 20)
    assert f.last_path == "grouped"
    live = np.ones(len(db), bool)
    live[::13] = False
    sq = ((db[:8, None, :].astype(np.float64)
           - db[None, :, :].astype(np.float64)) ** 2).sum(-1)
    sq[:, ~live] = np.inf
    oi = np.argsort(sq, axis=1)[:, :20]
    for q in range(8):
        assert set(map(int, i[q])) == set(map(int, oi[q]))
    assert np.all(np.diff(d, axis=1) >= 0)
    assert not np.isin(i, rows[::13]).any()
