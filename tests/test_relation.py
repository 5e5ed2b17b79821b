"""Relation facade tests — DDL/DML/query flow through the planner."""

import numpy as np
import pytest

from pgvector_tpu.errors import DataException
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.relation import Relation
from pgvector_tpu.store.table import DenseTable


def test_end_to_end(rng):
    db = rng.normal(size=(2000, 8)).astype(np.float32)
    rel = Relation(DenseTable(8))
    rel.insert(db)
    idx = rel.create_index("hnsw", Metric.L2, m=8, ef_construction=32,
                           wave_size=256)
    q = db[:5]
    d, i = rel.knn(q, 5, ef_search=60)
    assert (i[:, 0] == np.arange(5)).all()  # own row nearest
    # exact override matches FlatIndex
    d2, i2 = rel.knn(q, 5, use_index=False)
    e_d, e_i = FlatIndex(rel.table, Metric.L2).search(q, 5)
    assert np.allclose(d2, e_d) and (i2 == e_i).all()
    # DML flows through the index
    rows = rel.insert(db[:3] + 10.0)
    _, i3 = rel.knn((db[0] + 10.0)[None, :], 1, ef_search=40)
    assert i3[0, 0] == rows[0]
    rel.delete([0])
    rel.vacuum()
    _, i4 = rel.knn(db[:1], 1, ef_search=40)
    assert i4[0, 0] != 0


def test_explain(rng):
    rel = Relation(DenseTable(8))
    rel.insert(rng.normal(size=(500, 8)).astype(np.float32))
    rel.create_index("ivfflat", Metric.L2, lists=4, seed=1)
    plan = rel.explain(Metric.L2)
    assert "Seq Scan" in plan and "ivfflat" in plan and "chosen" in plan


def test_bad_am():
    rel = Relation(DenseTable(4))
    # btree became a real AM in round 3 (sql/vector.sql:300-346 parity);
    # an unknown AM still errors with the reference's message shape
    with pytest.raises(DataException, match='access method "gist" does not exist'):
        rel.create_index("gist", Metric.L2)


def test_knn_exact_path_honors_filter_mask(rng):
    """filter_mask must bind on EVERY planner path — the exact-scan branch
    used to drop it silently (index paths always honored it)."""
    db = rng.normal(size=(300, 8)).astype(np.float32)
    rel = Relation(DenseTable(8))
    rows = rel.insert(db)
    mask = np.ones(rel.table.capacity, bool)
    mask[rows[:150]] = False
    # tiny table with no index → planner picks the exact scan
    d, i = rel.knn(db[0], k=5, metric=Metric.L2, filter_mask=mask)
    assert (i >= 150).all()
    d2, i2 = rel.knn(db[0], k=5, metric=Metric.L2, use_index=False,
                     filter_mask=mask)
    assert (i2 >= 150).all()


def test_default_metric_skips_btree_index(rng):
    """A btree OrderedIndex carries no opclass metric; _default_metric must
    skip it instead of raising AttributeError."""
    db = rng.normal(size=(64, 4)).astype(np.float32)
    rel = Relation(DenseTable(4))
    rel.insert(db)
    rel.create_index("btree")
    d, i = rel.knn(db[0], k=3)  # falls back to L2
    assert i[0, 0] == 0 if i.ndim == 2 else i[0] == 0
    rel.create_index("hnsw", Metric.IP, m=4, ef_construction=16)
    assert rel._default_metric() is Metric.IP


def test_scan_stats_and_explain_analyze(rng):
    """pg_stat observability analogue: idx.stats counts scans/queries/
    searches/tuples (pgstat_count_index_scan; PG18 nsearches incl.
    iterative resumes), and EXPLAIN ANALYZE reports actual rows, Index
    Searches, and wall time (hnswscan.c:206-210)."""
    from pgvector_tpu.config import config

    db = rng.normal(size=(4000, 8)).astype(np.float32)
    rel = Relation(DenseTable(8))
    rel.insert(db)
    idx = rel.create_index("hnsw", Metric.L2, m=8, ef_construction=32,
                           wave_size=512)
    assert idx.stats.as_dict() == {"scans": 0, "queries": 0, "searches": 0,
                                   "tuples_returned": 0}
    rel.knn(db[:6], k=5)
    s = idx.stats.as_dict()
    assert s["scans"] == 1 and s["queries"] == 6 and s["searches"] == 6
    assert s["tuples_returned"] == 30
    # iterative resumes bump nsearches past the query count: filter to a
    # sliver so the first ef pool can't fill k
    mask = np.zeros(rel.table.capacity, bool)
    mask[:40] = True
    with config.local(**{"hnsw.iterative_scan": "relaxed_order"}):
        rel.knn(db[0], k=10, ef_search=12, filter_mask=mask)
    s2 = idx.stats.as_dict()
    assert s2["scans"] == 2 and s2["queries"] == 7
    assert s2["searches"] > s["searches"] + 1  # resumed at least once
    idx.stats.reset()
    assert idx.stats.scans == 0

    plan = rel.explain(Metric.L2, analyze=True, q=db[0], k=5, ef_search=40)
    assert "Rows Returned: 5" in plan
    assert "Index Searches: 1" in plan
    assert "Execution Time:" in plan
    with pytest.raises(DataException, match="requires a query"):
        rel.explain(Metric.L2, analyze=True)
