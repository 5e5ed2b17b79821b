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
