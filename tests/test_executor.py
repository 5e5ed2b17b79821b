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


def test_writer_serialized_with_reads():
    """The single-writer contract (test/t/016 + 046-048 methodology):
    reader threads hammer searches while inserts and a vacuum flow through
    submit_write().  Every resolved result must be internally consistent —
    each (distance, row) pair matches the row's true stored vector (a torn
    read of mid-mutation index state would break the pairing) — and the
    final state equals exact search."""
    from pgvector_tpu.index.hnsw import HNSWIndex

    rng = np.random.default_rng(99)
    db = rng.normal(size=(1200, 8)).astype(np.float32)
    table = DenseTable(8)
    rows0 = table.insert(db[:600])
    idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32,
                    wave_size=128, beam_expand=4)
    ex = BatchingExecutor(idx, max_batch=8, max_wait_ms=1)
    queries = db[:24] + 0.01
    stop = threading.Event()
    failures = []

    def reader(j):
        while not stop.is_set():
            try:
                d, r = ex.search(queries[j % 24], 5, timeout=120)
            except Exception as exc:  # pragma: no cover
                failures.append(exc)
                return
            for dd, rr in zip(d, r):
                if rr < 0:
                    continue
                true = np.sqrt(((queries[j % 24]
                                 - db[int(rr)]) ** 2).sum())
                if abs(dd - true) > 1e-3:
                    failures.append(
                        AssertionError(f"torn read: row {rr} d={dd} true={true}"))
                    return

    readers = [threading.Thread(target=reader, args=(j,)) for j in range(4)]
    for t in readers:
        t.start()
    try:
        # interleave inserts and a vacuum through the serialized write path
        for s in range(600, 1200, 200):
            chunk = db[s: s + 200]

            def do_insert(index, chunk=chunk):
                rows = table.insert(chunk)
                index.insert(rows)
                return rows

            ex.write(do_insert, timeout=300)

        def do_vacuum(index):
            table.delete(rows0[:100])
            index.vacuum()

        ex.write(do_vacuum, timeout=300)
    finally:
        stop.set()
        for t in readers:
            t.join(timeout=60)
        ex.shutdown()
    assert not failures, failures[:3]
    # final state matches exact search
    exact_d, exact_i = FlatIndex(table, Metric.L2).search(queries, 5)
    d, r = idx.search(queries, 5, ef_search=64)
    hits = sum(len(set(map(int, a)) & set(map(int, e)))
               for a, e in zip(r, exact_i))
    assert hits / (5 * len(queries)) >= 0.9


def test_lone_write_does_not_busy_spin():
    """A write that empties the queue must clear the wake event — before the
    fix, the dispatcher spun at 100% CPU (wait() returned immediately with
    an empty queue) until the next submit."""
    import time

    table = DenseTable(4)
    table.insert(np.zeros((4, 4), np.float32))
    ex = BatchingExecutor(FlatIndex(table, Metric.L2), max_wait_ms=0.5)
    try:
        assert ex.write(lambda idx: 42) == 42
        time.sleep(0.2)  # let the dispatcher settle
        assert not ex._wake.is_set()
        t0 = time.process_time()
        time.sleep(0.5)
        assert time.process_time() - t0 < 0.25  # idle, not spinning
    finally:
        ex.shutdown()
