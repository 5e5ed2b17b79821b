"""Insert/vacuum maintenance coverage for non-dense index kinds (the
vacuum-recall methodology of test/t/014/022/026/030 applied to bit and
sparse HNSW)."""

import numpy as np
import pytest

from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import BitTable, SparseTable
from pgvector_tpu.types import SparseVec


def recall(r, e):
    return sum(len(set(map(int, a)) & set(map(int, b))) for a, b in zip(r, e)) / r.size


def test_bit_hnsw_insert_vacuum(rng):
    db = rng.random((600, 48)) < 0.5
    q = rng.random((8, 48)) < 0.5
    table = BitTable(48)
    rows = table.insert(db[:400])
    idx = HNSWIndex(table, Metric.HAMMING, m=8, ef_construction=32,
                    wave_size=128, dedup=False)
    rows2 = table.insert(db[400:])
    idx.insert(rows2)
    _, e_i = FlatIndex(table, Metric.HAMMING).search(q, 10)
    _, r = idx.search(q, 10, ef_search=80)
    assert recall(r, e_i) >= 0.8
    kill = np.arange(0, 300)
    table.delete(kill)
    idx.vacuum()
    _, r = idx.search(q, 10, ef_search=80)
    assert (~np.isin(r, kill)).all()
    _, e_i = FlatIndex(table, Metric.HAMMING).search(q, 10)
    assert recall(r, e_i) >= 0.75


def test_sparse_hnsw_insert_vacuum(rng):
    dense = (rng.normal(size=(500, 30)) * (rng.random((500, 30)) < 0.3)).astype(np.float32)
    dense[dense.sum(axis=1) == 0, 0] = 1.0
    table = SparseTable(30, nnz_cap=32)
    rows = table.insert([SparseVec.from_dense(r) for r in dense[:350]])
    idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32, wave_size=128)
    rows2 = table.insert([SparseVec.from_dense(r) for r in dense[350:]])
    idx.insert(rows2)
    q = [SparseVec.from_dense(r) for r in dense[:6]]
    _, e_i = FlatIndex(table, Metric.L2).search(q, 10)
    _, r = idx.search(q, 10, ef_search=80)
    assert recall(r, e_i) >= 0.8
    kill = np.arange(0, 200)
    table.delete(kill)
    idx.vacuum()
    _, r = idx.search(q, 10, ef_search=80)
    assert (~np.isin(r, kill)).all()
