"""Reference recall-floor methodology (test/t/012_hnsw_vector_build_recall
and test/t/003_ivfflat_build_recall): random low-dim vectors, exact top-20
ground truth from a seq scan, assert recall floors per opclass.

The reference runs 10k×3d with floors ≥0.99 (L2/cos/L1) and ≥0.97 (IP) at
default knobs (test/t/012:94); here 5k×3d for CI wall-time with the same
floors minus a small wave-build allowance.
"""

import numpy as np
import pytest

from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.index.ivfflat import IVFFlatIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import DenseTable

N, NQ, K = 5000, 20, 20


def recall(r, e):
    return sum(len(set(map(int, a)) & set(map(int, b))) for a, b in zip(r, e)) / (len(r) * K)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(2024)
    db = rng.random((N, 3)).astype(np.float32)  # uniform like random() * 10
    q = rng.random((NQ, 3)).astype(np.float32)
    table = DenseTable(3)
    table.insert(db)
    return table, q


@pytest.mark.parametrize("metric,floor", [
    (Metric.L2, 0.97),
    (Metric.COSINE, 0.97),
    (Metric.L1, 0.97),
    (Metric.IP, 0.95),
])
def test_hnsw_build_recall_floor(metric, floor, data):
    table, q = data
    _, e_i = FlatIndex(table, metric).search(q, K)
    idx = HNSWIndex(table, metric, m=16, ef_construction=64, wave_size=1024)
    _, r = idx.search(q, K, ef_search=40)
    assert recall(r, e_i) >= floor


def test_ivfflat_build_recall_floor(data):
    table, q = data
    _, e_i = FlatIndex(table, Metric.L2).search(q, K)
    idx = IVFFlatIndex(table, Metric.L2, lists=50, seed=3)
    _, r = idx.search(q, K, probes=50)  # all lists probed, like SET probes=lists
    assert recall(r, e_i) >= 0.99


# -- exact reference contract: 10k rows, k=20, DEFAULT ef_search=40, floors
# 0.99 (L2/cos/L1) / 0.97 (IP) — test/t/012_hnsw_vector_build_recall.pl:94.
# Slow-marked: one full 10k wave build per metric on the CPU mesh.

@pytest.mark.slow
@pytest.mark.parametrize("metric,floor", [
    (Metric.L2, 0.99),
    (Metric.COSINE, 0.99),
    (Metric.L1, 0.99),
    (Metric.IP, 0.97),
])
def test_hnsw_build_recall_reference_contract(metric, floor):
    rng = np.random.default_rng(12)
    db = (rng.random((10000, 3)) * 10).astype(np.float32)
    q = (rng.random((NQ, 3)) * 10).astype(np.float32)
    table = DenseTable(3)
    table.insert(db)
    _, e_i = FlatIndex(table, metric).search(q, K)
    idx = HNSWIndex(table, metric, m=16, ef_construction=64,
                    wave_size=1024, dedup=False)
    _, r = idx.search(q, K)  # DEFAULT hnsw.ef_search = 40
    assert recall(r, e_i) >= floor


@pytest.mark.slow
def test_ivfflat_build_recall_reference_contract():
    """test/t/003 shape: 10k rows, lists=100, probes up to lists."""
    rng = np.random.default_rng(12)
    db = (rng.random((10000, 3)) * 10).astype(np.float32)
    q = (rng.random((NQ, 3)) * 10).astype(np.float32)
    table = DenseTable(3)
    table.insert(db)
    _, e_i = FlatIndex(table, Metric.L2).search(q, K)
    idx = IVFFlatIndex(table, Metric.L2, lists=100, seed=3)
    _, r = idx.search(q, K, probes=100)
    assert recall(r, e_i) >= 0.99
