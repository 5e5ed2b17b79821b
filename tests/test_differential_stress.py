"""Differential stress tests — randomized mutation sequences vs an exact
oracle.

The reference's hardest bugs surface under interleaved insert / delete /
vacuum traffic (its pgbench TAP tests, test/t/007, 016, 038, 046-048).
This is the library-shaped analogue: a seeded random op sequence drives an
index and a shadow numpy model in lockstep; after every vacuum (and at the
end) the index's search results are checked against a float64 brute-force
oracle over the shadow state.

Assertions are structural (never flaky): deleted rows never surface,
returned (distance, id) pairs match the row's true stored distance, results
are sorted, and recall against the exact oracle clears a floor far below
what a healthy graph delivers at these sizes.
"""

import numpy as np
import pytest

from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.index.ivfflat import IVFFlatIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import BitTable, DenseTable, SparseTable
from pgvector_tpu.types import SparseVec

DIM = 12


def _oracle_topk(metric, qs, db, live, k):
    """float64 exact top-k over live rows; returns per-query id sets."""
    q = qs.astype(np.float64)
    d = db.astype(np.float64)
    if metric is Metric.L2:
        s = ((q[:, None, :] - d[None, :, :]) ** 2).sum(-1)
    elif metric is Metric.IP:
        s = -(q @ d.T)
    else:  # cosine
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        dn = np.linalg.norm(d, axis=1, keepdims=True)
        denom = qn * dn.T
        s = np.where(denom > 0, 1 - (q @ d.T) / np.where(denom > 0, denom, 1),
                     np.inf)
    s = np.where(live[None, :], s, np.inf)
    kk = min(k, int(live.sum()))
    return [set(np.argsort(row, kind="stable")[:kk].tolist()) for row in s]


def _check_state(idx, metric, table, db, qs, k, floor, search_kw=None):
    live = np.asarray(table.valid[: table.count]).copy()
    live_n = int(live.sum())
    if live_n == 0:
        return
    if search_kw is None:
        search_kw = ({"ef_search": 80} if isinstance(idx, HNSWIndex)
                     else {"probes": 8})
    d, r = idx.search(qs, k, **search_kw)
    # 1. deleted/absent rows never surface; pairs are (finite, valid-id)
    for qi in range(len(qs)):
        for dd, rr in zip(d[qi], r[qi]):
            if rr < 0:
                assert not np.isfinite(dd)
                continue
            assert live[rr], f"dead row {rr} surfaced"
            # 2. emitted distance matches the true stored value
            if metric is Metric.L2:
                true = np.sqrt(((qs[qi] - db[rr]) ** 2).sum())
            elif metric is Metric.IP:
                true = -float(qs[qi] @ db[rr])
            else:
                true = 1 - float(qs[qi] @ db[rr]) / (
                    np.linalg.norm(qs[qi]) * np.linalg.norm(db[rr]))
            assert abs(dd - true) < 1e-3, (dd, true, rr)
        # 3. sorted output
        fin = d[qi][np.isfinite(d[qi])]
        assert np.all(np.diff(fin) >= -1e-6)
    # 4. recall floor vs the f64 oracle
    exact = _oracle_topk(metric, qs, db, live, k)
    hits = sum(len(set(map(int, rr[rr >= 0])) & ex)
               for rr, ex in zip(r, exact))
    denom = sum(len(ex) for ex in exact)
    assert denom == 0 or hits / denom >= floor, hits / denom


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE])
def test_hnsw_mutation_sequence_vs_oracle(metric):
    rng = np.random.default_rng(101)
    db = rng.normal(size=(2600, DIM)).astype(np.float32)
    if metric is Metric.COSINE:
        db[5] = 0.0  # zero vector: skipped by cosine indexing, never fatal
    qs = (db[:12] + 0.01).astype(np.float32)
    table = DenseTable(DIM)
    table.insert(db[:1200])
    idx = HNSWIndex(table, metric, m=8, ef_construction=32, wave_size=256,
                    beam_expand=4, seed=7)
    inserted = 1200
    rounds = 0
    while inserted < len(db):
        step = int(rng.integers(150, 400))
        rows = table.insert(db[inserted: inserted + step])
        idx.insert(rows)
        inserted += step
        # delete a random slice of currently-live rows
        live_ids = np.flatnonzero(np.asarray(table.valid[: table.count]))
        kill = rng.choice(live_ids, size=len(live_ids) // 10, replace=False)
        table.delete(kill)
        idx.vacuum()
        rounds += 1
        _check_state(idx, metric, table, db[: table.count], qs, 10,
                     floor=0.85)
    assert rounds >= 3


def test_ivfflat_mutation_sequence_vs_oracle():
    rng = np.random.default_rng(103)
    db = rng.normal(size=(3000, DIM)).astype(np.float32)
    qs = (db[:12] + 0.01).astype(np.float32)
    table = DenseTable(DIM)
    table.insert(db[:1500])
    idx = IVFFlatIndex(table, Metric.L2, lists=8, seed=9)
    inserted = 1500
    while inserted < len(db):
        step = int(rng.integers(200, 500))
        rows = table.insert(db[inserted: inserted + step])
        idx.insert(rows)
        inserted += step
        live_ids = np.flatnonzero(np.asarray(table.valid[: table.count]))
        kill = rng.choice(live_ids, size=len(live_ids) // 8, replace=False)
        table.delete(kill)
        idx.vacuum()
        # probes=8 == lists → exhaustive: recall must be ~1.0
        _check_state(idx, Metric.L2, table, db[: table.count], qs, 10,
                     floor=0.999)


def test_bit_hnsw_mutation_sequence():
    """Hamming HNSW under churn: structural invariants only (bit distances
    are integral, ties are everywhere, so the oracle check is containment
    + exactness of emitted distances)."""
    rng = np.random.default_rng(105)
    bits = rng.random((1800, 64)) > 0.5
    table = BitTable(64)
    table.insert(bits[:900])
    idx = HNSWIndex(table, Metric.HAMMING, m=8, ef_construction=32,
                    wave_size=256, seed=3)
    inserted = 900
    while inserted < len(bits):
        rows = table.insert(bits[inserted: inserted + 300])
        idx.insert(rows)
        inserted += 300
        live_ids = np.flatnonzero(np.asarray(table.valid[: table.count]))
        kill = rng.choice(live_ids, size=60, replace=False)
        table.delete(kill)
        idx.vacuum()
        live = np.asarray(table.valid[: table.count])
        d, r = idx.search(bits[:8], 5, ef_search=60)
        packed_q = bits[:8]
        for qi in range(8):
            for dd, rr in zip(d[qi], r[qi]):
                if rr < 0:
                    continue
                assert live[rr]
                true = int((packed_q[qi] ^ bits[rr]).sum())
                assert int(dd) == true, (dd, true)


def test_sparse_hnsw_mutation_sequence():
    rng = np.random.default_rng(107)

    def sv():
        nz = int(rng.integers(2, 6))
        ix = np.sort(rng.choice(40, nz, replace=False)).astype(np.int32)
        return SparseVec(40, ix, rng.normal(size=nz).astype(np.float32))

    vecs = [sv() for _ in range(1200)]
    table = SparseTable(40, nnz_cap=8)
    table.insert(vecs[:600])
    idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32,
                    wave_size=256, seed=11)
    inserted = 600
    while inserted < len(vecs):
        rows = table.insert(vecs[inserted: inserted + 200])
        idx.insert(rows)
        inserted += 200
        live_ids = np.flatnonzero(np.asarray(table.valid[: table.count]))
        kill = rng.choice(live_ids, size=50, replace=False)
        table.delete(kill)
        idx.vacuum()
    # end state: agrees with the exact engine within a healthy floor
    live = np.asarray(table.valid[: table.count])
    q = [vecs[i] for i in range(6)]
    d, r = idx.search(q, 5, ef_search=60)
    e_d, e_i = FlatIndex(table, Metric.L2).search(q, 5)
    hits = sum(len(set(map(int, a[a >= 0])) & set(map(int, b[b >= 0])))
               for a, b in zip(r, e_i))
    denom = sum((b >= 0).sum() for b in e_i)
    assert hits / max(denom, 1) >= 0.85
    assert not np.isin(r, np.flatnonzero(~live)).any()


def test_btree_mutation_sequence_vs_oracle():
    """OrderedIndex under random insert/delete/vacuum churn must stay
    byte-for-byte equal to a rebuild (scan order, equality and range
    results) — the incremental bisect path has its own placement logic
    and is where an off-by-lo once landed every insert past its key run."""
    from pgvector_tpu.index.btree import OrderedIndex

    rng = np.random.default_rng(107)
    # small value alphabet → plenty of duplicate keys (the tie-order path)
    vocab = rng.normal(size=(40, 3)).astype(np.float32)
    table = DenseTable(3)
    db = vocab[rng.integers(0, len(vocab), size=300)]
    table.insert(db[:120])
    idx = OrderedIndex(table)
    inserted = 120
    while inserted < len(db):
        step = int(rng.integers(20, 60))
        rows = table.insert(db[inserted: inserted + step])
        # shuffled insert order stresses within-run row-id placement
        idx.insert(rng.permutation(rows))
        inserted += step
        live_ids = np.flatnonzero(np.asarray(table.valid[: table.count]))
        kill = rng.choice(live_ids, size=len(live_ids) // 8, replace=False)
        table.delete(kill)
        if rng.random() < 0.5:
            idx.vacuum()  # sometimes rely on scan-time filtering instead
        rebuilt = OrderedIndex(table)
        np.testing.assert_array_equal(idx.scan(), rebuilt.scan())
        probe = vocab[int(rng.integers(0, len(vocab)))]
        np.testing.assert_array_equal(idx.search_eq(probe),
                                      rebuilt.search_eq(probe))
        lo, hi = sorted([vocab[int(rng.integers(0, len(vocab)))],
                         probe], key=lambda v: tuple(v))
        np.testing.assert_array_equal(idx.search_range(lo=lo, hi=hi),
                                      rebuilt.search_range(lo=lo, hi=hi))


def test_filtered_iterative_scan_recall_vs_oracle():
    """Heavy filtering + relaxed_order iterative scan (README.md:424-466 +
    478-517): with the tuple cap left at its default, the scan must keep
    resuming until it actually finds the filtered neighbors — pinned as
    recall against the exact top-k among mask-passing rows, not just as
    'returns more rows than the capped scan'."""
    from pgvector_tpu.config import config
    from pgvector_tpu.index.hnsw import HNSWIndex

    rng = np.random.default_rng(109)
    db = rng.normal(size=(3000, DIM)).astype(np.float32)
    qs = (db[:10] + 0.01).astype(np.float32)
    table = DenseTable(DIM)
    table.insert(db)
    idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32,
                    wave_size=256, beam_expand=4, seed=11)
    mask = np.zeros(table.capacity, bool)
    mask[::25] = True  # 4% selectivity — far below ef/k, forces resumes
    live = np.zeros(len(db), bool)
    live[::25] = True
    exact = _oracle_topk(Metric.L2, qs, db, live, 10)
    with config.local(**{"hnsw.iterative_scan": "relaxed_order"}):
        d, r = idx.search(qs, 10, ef_search=40, filter_mask=mask)
    assert all(int(x) % 25 == 0 for x in r[r >= 0].ravel())
    hits = sum(len(set(map(int, rr[rr >= 0])) & ex)
               for rr, ex in zip(r, exact))
    denom = sum(len(ex) for ex in exact)
    assert hits / denom >= 0.8, hits / denom


def test_filtered_iterative_ivf_recall_vs_oracle():
    """IVF analogue: relaxed iterative scan under heavy filtering keeps
    probing further lists (ivfscan.c:400-406, bounded by ivfflat.max_probes)
    until the filtered top-k is actually found — pinned as oracle recall."""
    from pgvector_tpu.config import config
    from pgvector_tpu.index.ivfflat import IVFFlatIndex

    rng = np.random.default_rng(111)
    db = rng.normal(size=(3000, DIM)).astype(np.float32)
    qs = (db[:10] + 0.01).astype(np.float32)
    table = DenseTable(DIM)
    table.insert(db)
    idx = IVFFlatIndex(table, Metric.L2, lists=16, seed=13)
    mask = np.zeros(table.capacity, bool)
    mask[::25] = True
    live = np.zeros(len(db), bool)
    live[::25] = True
    exact = _oracle_topk(Metric.L2, qs, db, live, 10)
    with config.local(**{"ivfflat.iterative_scan": "relaxed_order"}):
        d, r = idx.search(qs, 10, probes=1, filter_mask=mask)
    assert all(int(x) % 25 == 0 for x in r[r >= 0].ravel())
    # relaxed order stops probing once every query has k passing matches
    # (the executor-stops-pulling contract) — so each query must be FULL,
    # but the matches come from the nearest lists only, not the global
    # filtered top-k
    assert (r >= 0).all()
    # probing everything (probes=lists) IS the exact filtered top-k
    d2, r2 = idx.search(qs, 10, probes=idx.lists, filter_mask=mask)
    hits = sum(len(set(map(int, rr[rr >= 0])) & ex)
               for rr, ex in zip(r2, exact))
    denom = sum(len(ex) for ex in exact)
    assert hits / denom >= 0.999, hits / denom


def test_device_sharded_mutation_sequence_vs_oracle(tmp_path):
    """The sharded lifecycle under churn, on the 2-D fan-out mesh: insert
    routing to the least-loaded shard, vacuum propagation + per-shard
    4-pass repair, and a mid-sequence checkpoint round-trip, all checked
    against the f64 oracle (the sharded form of test/t/007/016/038)."""
    import jax

    from pgvector_tpu.parallel import DeviceShardedHNSWIndex, make_mesh2

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(107)
    db = rng.normal(size=(2000, DIM)).astype(np.float32)
    qs = (db[:10] + 0.01).astype(np.float32)
    table = DenseTable(DIM)
    table.insert(db[:1000])
    mesh = make_mesh2(2, 4)
    idx = DeviceShardedHNSWIndex(mesh, table, Metric.L2, m=8,
                                 ef_construction=32, wave_size=256,
                                 qaxis="qp", seed=11)
    inserted, round_i = 1000, 0
    while inserted < len(db):
        step = int(rng.integers(250, 500))
        rows = table.insert(db[inserted: inserted + step])
        idx.insert(rows)
        inserted += step
        live_ids = np.flatnonzero(np.asarray(table.valid[: table.count]))
        kill = rng.choice(live_ids, size=len(live_ids) // 10, replace=False)
        table.delete(kill)
        idx.vacuum()
        if round_i == 1:  # replica state transfer mid-sequence
            idx.save(str(tmp_path / "ck"))
            idx = DeviceShardedHNSWIndex.load(mesh, table,
                                              str(tmp_path / "ck"),
                                              qaxis="qp")
        _check_state(idx, Metric.L2, table, db[: table.count], qs, 10,
                     floor=0.85, search_kw={"ef_search": 80})
        round_i += 1
    assert round_i >= 2


def test_device_sharded_ivf_mutation_sequence_vs_oracle():
    import jax

    from pgvector_tpu.parallel import DeviceShardedIVFFlatIndex, make_mesh2

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(109)
    db = rng.normal(size=(2200, DIM)).astype(np.float32)
    qs = (db[:10] + 0.01).astype(np.float32)
    table = DenseTable(DIM)
    table.insert(db[:1100])
    idx = DeviceShardedIVFFlatIndex(make_mesh2(2, 4), table, Metric.L2,
                                    lists=8, seed=13, qaxis="qp")
    inserted = 1100
    while inserted < len(db):
        step = int(rng.integers(300, 600))
        rows = table.insert(db[inserted: inserted + step])
        idx.insert(rows)
        inserted += step
        live_ids = np.flatnonzero(np.asarray(table.valid[: table.count]))
        kill = rng.choice(live_ids, size=len(live_ids) // 8, replace=False)
        table.delete(kill)
        idx.vacuum()
        # probes == lists → exhaustive per shard: recall must be ~1.0
        _check_state(idx, Metric.L2, table, db[: table.count], qs, 10,
                     floor=0.999, search_kw={"probes": 8})
