"""Batching executor tests — concurrent single-query submits coalesce into
device batches and return correct per-query results (the concurrency story
of test/t/016's pgbench clients, library-style)."""

import threading

import numpy as np
import pytest

from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.runtime import BatchingExecutor
from pgvector_tpu.store.table import DenseTable


def test_concurrent_submits():
    rng = np.random.default_rng(123)  # hermetic: session rng state varies with test order
    db = rng.normal(size=(500, 8)).astype(np.float32)
    table = DenseTable(8)
    table.insert(db)
    flat = FlatIndex(table, Metric.L2)
    ex = BatchingExecutor(flat, max_batch=16, max_wait_ms=5)
    try:
        e_d, e_i = flat.search(db[:20], 5)
        results = [None] * 20
        def worker(j):
            results[j] = ex.search(db[j], 5)
        threads = [threading.Thread(target=worker, args=(j,)) for j in range(20)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for j, (d, i) in enumerate(results):
            assert i[0] == j  # own row is the nearest
            assert np.allclose(d, e_d[j], rtol=1e-4, atol=1e-4)
    finally:
        ex.shutdown()


def test_mixed_k(rng):
    db = rng.normal(size=(100, 4)).astype(np.float32)
    table = DenseTable(4)
    table.insert(db)
    ex = BatchingExecutor(FlatIndex(table, Metric.L2), max_wait_ms=1)
    try:
        f1 = ex.submit(db[0], 3)
        f2 = ex.submit(db[1], 7)
        d1, i1 = f1.result(timeout=10)
        d2, i2 = f2.result(timeout=10)
        assert len(i1) == 3 and len(i2) == 7
    finally:
        ex.shutdown()


def test_shutdown_rejects():
    table = DenseTable(4)
    table.insert(np.zeros((4, 4), np.float32))
    ex = BatchingExecutor(FlatIndex(table, Metric.L2))
    ex.shutdown()
    with pytest.raises(RuntimeError):
        ex.submit(np.zeros(4, np.float32), 1)
