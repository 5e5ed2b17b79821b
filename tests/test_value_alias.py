# Index-value heap aliasing (round 4): dense non-cosine / bit / sparse
# HNSW indexes alias the table's value arrays while the element↔row
# mapping is the identity, materializing a private copy on first
# divergence.  The reference always copies (HnswFormIndexValue,
# hnswutils.c:406-428); the alias is an HBM optimization that must be
# invisible — these tests pin the invariants that keep it so.
import numpy as np
import pytest

from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import BitTable, DenseTable, SparseTable
from pgvector_tpu.types.sparsevec import SparseVec


def _recall(idx, table, q, metric, ef=64, k=10):
    _, gt = FlatIndex(table, metric).search(q, k)
    _, r = idx.search(q, k, ef_search=ef)
    gt, r = np.asarray(gt), np.asarray(r)
    return np.mean([len(set(map(int, a)) & set(map(int, e))) / k
                    for a, e in zip(r, gt)])


def test_alias_engages_and_matches_copy_semantics():
    rng = np.random.default_rng(3)
    db = rng.normal(size=(1500, 16)).astype(np.float32)
    t = DenseTable(16, capacity=1500)
    t.insert(db)
    idx = HNSWIndex(t, Metric.L2, m=8, ef_construction=32, dedup=False)
    assert idx._alias_values
    assert idx.values[0] is t.data  # zero-copy, not a materialized equal
    assert _recall(idx, t, db[:30], Metric.L2) > 0.9


def test_cosine_never_aliases():
    rng = np.random.default_rng(4)
    db = rng.normal(size=(600, 16)).astype(np.float32)
    t = DenseTable(16, capacity=600)
    t.insert(db)
    idx = HNSWIndex(t, Metric.COSINE, m=8, ef_construction=32)
    # cosine stores NORMALIZED copies (hnswutils.c:417-423) — aliasing the
    # raw heap would score un-normalized vectors
    assert not idx._alias_values


def test_vacuum_zeroing_never_touches_the_heap():
    rng = np.random.default_rng(5)
    db = rng.normal(size=(1200, 16)).astype(np.float32)
    t = DenseTable(16, capacity=1200)
    t.insert(db)
    idx = HNSWIndex(t, Metric.L2, m=8, ef_construction=32, dedup=False)
    assert idx._alias_values
    before = np.asarray(t.data[:1200])
    t.delete(np.arange(100))
    idx.vacuum()
    assert not idx._alias_values
    # MarkDeleted zeroes INDEX value data (hnswvacuum.c:694-699) — the
    # heap rows themselves must be untouched
    np.testing.assert_array_equal(np.asarray(t.data[:1200]), before)
    assert float(np.abs(np.asarray(idx.values[0][:100])).max()) == 0.0
    assert _recall(idx, t, db[200:230], Metric.L2) > 0.85


def test_slot_reuse_after_vacuum_materializes_correct_values():
    rng = np.random.default_rng(6)
    db = rng.normal(size=(1000, 16)).astype(np.float32)
    t = DenseTable(16, capacity=1200)
    t.insert(db)
    idx = HNSWIndex(t, Metric.L2, m=8, ef_construction=32, dedup=False)
    t.delete(np.arange(50))
    idx.vacuum()
    t.insert(rng.normal(size=(50, 16)).astype(np.float32))
    idx.insert(np.arange(1000, 1050))  # reuses freed element slots
    assert _recall(idx, t, np.asarray(t.data[1000:1020]), Metric.L2) > 0.9


def test_bit_and_sparse_alias():
    rng = np.random.default_rng(7)
    bits = rng.random((800, 64)) > 0.5
    bt = BitTable(64, capacity=800)
    bt.insert(bits)
    bidx = HNSWIndex(bt, Metric.HAMMING, m=8, ef_construction=32,
                     dedup=False)
    assert bidx._alias_values
    assert bidx.values[0] is bt.data
    _, br = bidx.search(bits[:5], 5, ef_search=32)
    assert int(np.asarray(br)[0, 0]) == 0

    sv = [SparseVec(200, np.sort(rng.choice(200, 8, replace=False)).astype(np.int32),
                    rng.normal(size=8).astype(np.float32), _checked=True)
          for _ in range(400)]
    st = SparseTable(200, nnz_cap=8, capacity=400)
    st.insert(sv)
    sidx = HNSWIndex(st, Metric.IP, m=8, ef_construction=32, dedup=False)
    assert sidx._alias_values
    assert sidx.values[0] is st.idx and sidx.values[1] is st.val
    _, sr = sidx.search(sv[:5], 5, ef_search=32)
    assert np.asarray(sr).shape == (5, 5)


def test_alias_survives_table_growth_donation():
    # table.insert donates its old buffer to the append kernel; a stale
    # alias would read a deleted array — _refresh_alias must re-point
    rng = np.random.default_rng(8)
    db = rng.normal(size=(700, 16)).astype(np.float32)
    t = DenseTable(16, capacity=2000)
    t.insert(db)
    idx = HNSWIndex(t, Metric.L2, m=8, ef_construction=32, dedup=False,
                    capacity=2000)
    assert idx._alias_values
    t.insert(rng.normal(size=(700, 16)).astype(np.float32))
    idx.insert(np.arange(700, 1400))
    assert idx._alias_values  # identity mapping continued — still aliased
    assert _recall(idx, t, np.asarray(t.data[700:730]), Metric.L2) > 0.9


def test_grow_during_lazy_non_identity_insert_writes_batch_values():
    # ADVICE r4 (high): a lazy alias insert whose batch both reuses freed
    # slots (non-identity elem↔row mapping) AND pushes n_elems past cap_e
    # used to lose the batch's values — _grow() cleared _alias_values
    # before the `values is None` branch ran, so _materialize_values()
    # early-returned and the new elements silently kept the grow-pad
    # contents (table row e, or zeros past the table).
    rng = np.random.default_rng(12)
    db = rng.normal(size=(1000, 16)).astype(np.float32)
    t = DenseTable(16, capacity=4096)
    t.insert(db)
    idx = HNSWIndex(t, Metric.L2, m=8, ef_construction=32, dedup=False,
                    capacity=1024)
    assert idx._alias_values and idx.cap_e == 1024
    t.delete(np.arange(40))
    idx.vacuum()
    assert idx.free_slots  # non-identity mapping for the next batch
    new = rng.normal(size=(200, 16)).astype(np.float32) + 50.0  # far cluster
    rows = t.insert(new)
    idx.insert(rows)  # reuses freed slots AND grows 1024 → 2048 mid-call
    assert idx.cap_e == 2048 and not idx._alias_values
    # every new element's stored value must equal its heap row
    for r in map(int, rows):
        e = idx.row_to_elem[r]
        np.testing.assert_array_equal(np.asarray(idx.values[0][e]),
                                      np.asarray(t.data[r]))
    # and the far cluster must actually be found (wrong values → recall 0)
    assert _recall(idx, t, new[:20], Metric.L2) > 0.9
