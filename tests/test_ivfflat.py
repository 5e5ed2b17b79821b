"""IVFFlat recall + behavior tests — ports the methodology of
test/t/003-005 (build/insert recall), 006 (lists bounds), 032/042
(iterative scans), ivfvacuum semantics."""

import numpy as np
import pytest

from pgvector_tpu import config
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.ivfflat import IVFFlatIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import BitTable, DenseTable


def recall_at_k(approx_ids, exact_ids):
    hits = 0
    total = 0
    for a, e in zip(approx_ids, exact_ids):
        e = set(int(x) for x in e if x >= 0)
        hits += len(set(int(x) for x in a if x >= 0) & e)
        total += len(e)
    return hits / max(total, 1)


@pytest.fixture(scope="module")
def dense_data():
    rng = np.random.default_rng(12)
    db = rng.normal(size=(5000, 16)).astype(np.float32)
    q = rng.normal(size=(20, 16)).astype(np.float32)
    return db, q


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE])
def test_build_recall(metric, dense_data):
    db, q = dense_data
    table = DenseTable(16)
    table.insert(db)
    exact = FlatIndex(table, metric)
    e_d, e_i = exact.search(q, 10)
    idx = IVFFlatIndex(table, metric, lists=20, seed=1)
    d, i = idx.search(q, 10, probes=5)
    # test/t/003 asserts recall floors ≥0.97-0.99 with full probes; at
    # probes=lists/4 the floor is lower but must be strong
    assert recall_at_k(i, e_i) >= 0.75
    # with all lists probed recall must be ~1 (exhaustive)
    d, i = idx.search(q, 10, probes=20)
    assert recall_at_k(i, e_i) >= 0.99
    # distances are user-facing operator values
    assert np.allclose(np.sort(d[0]), np.sort(e_d[0]), rtol=1e-3, atol=1e-3)


def test_insert_recall(dense_data):
    db, q = dense_data
    table = DenseTable(16)
    rows1 = table.insert(db[:4000])
    idx = IVFFlatIndex(table, Metric.L2, lists=20, seed=1)
    rows2 = table.insert(db[4000:])
    idx.insert(rows2)
    exact = FlatIndex(table, Metric.L2)
    _, e_i = exact.search(q, 10)
    _, i = idx.search(q, 10, probes=20)
    assert recall_at_k(i, e_i) >= 0.99


def test_vacuum(dense_data):
    db, q = dense_data
    table = DenseTable(16)
    table.insert(db)
    idx = IVFFlatIndex(table, Metric.L2, lists=10, seed=1)
    kill = np.arange(0, 2500)
    table.delete(kill)
    idx.vacuum()
    _, i = idx.search(q, 10, probes=10)
    assert (~np.isin(i, kill)).all()
    exact = FlatIndex(table, Metric.L2)
    _, e_i = exact.search(q, 10)
    assert recall_at_k(i, e_i) >= 0.99


def test_cosine_zero_vectors_not_indexed():
    rng = np.random.default_rng(3)
    db = rng.normal(size=(200, 8)).astype(np.float32)
    db[7] = 0.0  # zero vector — must be silently skipped (README.md:937)
    table = DenseTable(8)
    table.insert(db)
    idx = IVFFlatIndex(table, Metric.COSINE, lists=5, seed=1)
    assert not idx.indexed_mask[7]
    _, i = idx.search(db[:1], 200, probes=5)
    assert 7 not in set(i[0].tolist())


def test_little_data_notice():
    notices = []
    table = DenseTable(4)
    table.insert(np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32))
    IVFFlatIndex(table, Metric.L2, lists=10, notice_hook=notices.append)
    assert any("little data" in n for n in notices)


def test_lists_bounds():
    from pgvector_tpu.errors import DataException

    table = DenseTable(4)
    with pytest.raises(DataException, match='out of bounds for option "lists"'):
        IVFFlatIndex(table, Metric.L2, lists=0, build=False)
    with pytest.raises(DataException, match='out of bounds for option "lists"'):
        IVFFlatIndex(table, Metric.L2, lists=40000, build=False)


def test_unsupported_opclass():
    from pgvector_tpu.errors import FeatureNotSupported

    table = DenseTable(4)
    with pytest.raises(FeatureNotSupported):
        IVFFlatIndex(table, Metric.L1, build=False)  # no ivfflat L1 opclass


def test_bit_hamming(dense_data):
    rng = np.random.default_rng(5)
    db = rng.random((2000, 64)) < 0.5
    q = rng.random((10, 64)) < 0.5
    table = BitTable(64)
    table.insert(db)
    exact = FlatIndex(table, Metric.HAMMING)
    _, e_i = exact.search(q, 10)
    idx = IVFFlatIndex(table, Metric.HAMMING, lists=8, seed=2)
    d, i = idx.search(q, 10, probes=8)
    # all lists probed → near-exhaustive (ties may differ)
    e_d, _ = exact.search(q, 10)
    assert np.allclose(np.sort(d, axis=1), np.sort(e_d, axis=1))


def test_iterative_scan_relaxed(dense_data):
    db, q = dense_data
    table = DenseTable(16)
    table.insert(db)
    idx = IVFFlatIndex(table, Metric.L2, lists=20, seed=1)
    # heavy filter: only every 50th row qualifies; one probe finds < k,
    # iterative scan keeps probing (ivfscan.c:400-406)
    fmask = np.zeros(table.capacity, bool)
    fmask[::50] = True
    with config.local(**{"ivfflat.iterative_scan": "relaxed_order",
                         "ivfflat.max_probes": 20}):
        d, i = idx.search(q[:4], 10, probes=1, filter_mask=fmask)
    assert (i >= 0).all()
    assert all((x % 50 == 0) for x in i.ravel())
    # without iterative scan, probes=1 finds fewer
    d2, i2 = idx.search(q[:4], 10, probes=1, filter_mask=fmask)
    assert (i2 >= 0).sum() <= (i >= 0).sum()


def test_filtered_search(dense_data):
    db, q = dense_data
    table = DenseTable(16)
    table.insert(db)
    idx = IVFFlatIndex(table, Metric.L2, lists=10, seed=1)
    fmask = np.zeros(table.capacity, bool)
    fmask[:100] = True
    _, i = idx.search(q, 5, probes=10, filter_mask=fmask)
    assert ((i >= 0) <= (i < 100)).all()


def test_inverted_vs_block_probe_equivalence(dense_data):
    """The inverted (query-grouped) scan and the block-gather scan are two
    formulations of GetScanItems (ivfscan.c:123-187) — same probed lists,
    same distances, same rows, including deletes and filter masks."""
    db, q = dense_data
    for metric in (Metric.L2, Metric.IP, Metric.COSINE):
        table = DenseTable(16)
        rows = table.insert(db)
        idx = IVFFlatIndex(table, metric, lists=20, seed=3)
        table.delete(rows[::7])  # deletes visible before any vacuum
        fmask = np.ones(table.capacity, bool)
        fmask[rows[::3]] = False
        for f in (None, fmask):
            cov = IVFFlatIndex.INVERT_COVERAGE
            try:
                IVFFlatIndex.INVERT_COVERAGE = 10**9  # force inverted
                d_inv, i_inv = idx.search(q, 10, probes=6, filter_mask=f)
                IVFFlatIndex.INVERT_COVERAGE = 0  # force the block path
                d_blk, i_blk = idx.search(q, 10, probes=6, filter_mask=f)
            finally:
                IVFFlatIndex.INVERT_COVERAGE = cov
            assert np.allclose(d_inv, d_blk, rtol=1e-4, atol=1e-4), metric
            # row sets must match wherever distances are distinct
            for r_a, r_b, dd in zip(i_inv, i_blk, d_inv):
                assert set(r_a[np.isfinite(dd)]) == set(
                    r_b[np.isfinite(dd)]), metric


def test_kmeans_metrics_vs_oracle(monkeypatch, rng):
    """IVFFLAT_KMEANS_DEBUG analogue (ivfbuild.c:558-601): inertia and the
    Davies-Bouldin index match a direct numpy evaluation of the reference
    formulas, and PGVECTOR_TPU_KMEANS_DEBUG=1 emits the INFO lines."""
    db = rng.normal(size=(600, 8)).astype(np.float32)
    table = DenseTable(8)
    table.insert(db)
    notices = []
    monkeypatch.setenv("PGVECTOR_TPU_KMEANS_DEBUG", "1")
    idx = IVFFlatIndex(table, Metric.L2, lists=6, seed=3,
                       notice_hook=notices.append)
    assert any(n.startswith("inertia:") for n in notices)
    assert any(n.startswith("davies-bouldin:") for n in notices)

    m = idx.kmeans_metrics()
    # oracle: squared-L2 distance proc over the actual assignment
    cent = np.asarray(idx.centroids, np.float64)
    a = idx.assignments[:600]
    d = ((db.astype(np.float64) - cent[a]) ** 2).sum(axis=1)
    assert abs(m["inertia"] - d.sum()) / d.sum() < 1e-4
    s = np.zeros(6)
    for i in range(6):
        if (a == i).any():
            s[i] = d[a == i].mean()
    cd = ((cent[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    ratios = (s[:, None] + s[None, :]) / np.where(cd > 0, cd, np.inf)
    np.fill_diagonal(ratios, -np.inf)
    db_oracle = ratios.max(axis=1).mean()
    assert abs(m["davies_bouldin"] - db_oracle) < 1e-3 * max(db_oracle, 1)


def test_kmeans_metrics_spherical():
    """Cosine opclass uses the spherical distance proc acos(ip)/pi
    (vector.c:703-721) for the debug metrics."""
    rng = np.random.default_rng(11)
    db = rng.normal(size=(300, 8)).astype(np.float32)
    table = DenseTable(8)
    table.insert(db)
    idx = IVFFlatIndex(table, Metric.COSINE, lists=4, seed=5)
    m = idx.kmeans_metrics()
    vals = db / np.linalg.norm(db, axis=1, keepdims=True)
    cent = np.asarray(idx.centroids, np.float64)
    a = idx.assignments[:300]
    ip = np.einsum("ij,ij->i", vals.astype(np.float64), cent[a])
    d = np.arccos(np.clip(ip, -1, 1)) / np.pi
    assert abs(m["inertia"] - d.sum()) / d.sum() < 1e-3
    assert 0 < m["inertia"] < 300  # angular distances are in [0, 1]
