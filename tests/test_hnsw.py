"""HNSW recall + behavior tests — ports the methodology of the reference's
TAP suite: build recall (test/t/012), insert recall (013), vacuum recall
(014), duplicate handling (015), iterative scans (041/043), option bounds
(hnsw.c:238-250)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pgvector_tpu import config
from pgvector_tpu.errors import DataException
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import BitTable, DenseTable, SparseTable
from pgvector_tpu.types import SparseVec


def recall_at_k(approx_ids, exact_ids):
    hits = total = 0
    for a, e in zip(approx_ids, exact_ids):
        e = set(int(x) for x in e if x >= 0)
        hits += len(set(int(x) for x in a if x >= 0) & e)
        total += len(e)
    return hits / max(total, 1)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    db = rng.normal(size=(1000, 12)).astype(np.float32)
    q = rng.normal(size=(20, 12)).astype(np.float32)
    return db, q


def build(db, metric, **kw):
    table = DenseTable(db.shape[1])
    table.insert(db)
    kw.setdefault("m", 8)
    kw.setdefault("ef_construction", 32)
    kw.setdefault("wave_size", 128)
    return table, HNSWIndex(table, metric, **kw)


# -- build recall (test/t/012: floors ≥0.97-0.99 at k=20 on 10k rows; here
# scaled down for CI: 1000 rows, floor 0.92 @ ef=80) ----------------------
@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE, Metric.L1])
def test_build_recall(metric, data):
    db, q = data
    table, idx = build(db, metric)
    _, e_i = FlatIndex(table, metric).search(q, 10)
    d, r = idx.search(q, 10, ef_search=80)
    floor = 0.90 if metric is Metric.IP else 0.92
    assert recall_at_k(r, e_i) >= floor
    # distances are user-facing operator values
    e_d, _ = FlatIndex(table, metric).search(q, 10)
    assert np.allclose(np.sort(d[0])[:5], np.sort(e_d[0])[:5], rtol=1e-3, atol=1e-3)


def test_insert_recall(data):
    db, q = data
    table = DenseTable(12)
    table.insert(db[:700])
    idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32, wave_size=128)
    rows2 = table.insert(db[700:])
    idx.insert(rows2)
    _, e_i = FlatIndex(table, Metric.L2).search(q, 10)
    _, r = idx.search(q, 10, ef_search=80)
    assert recall_at_k(r, e_i) >= 0.9


def test_vacuum_recall(data):
    db, q = data
    table, idx = build(db, Metric.L2)
    kill = np.arange(0, 500)
    table.delete(kill)
    idx.vacuum()
    _, r = idx.search(q, 10, ef_search=80)
    assert (~np.isin(r, kill)).all()
    _, e_i = FlatIndex(table, Metric.L2).search(q, 10)
    assert recall_at_k(r, e_i) >= 0.9
    # deleted elements are freed for reuse
    assert len(idx.free_slots) > 0


def test_deleted_rows_filtered_before_vacuum(data):
    db, q = data
    table, idx = build(db, Metric.L2)
    qv = db[3][None, :]
    _, r = idx.search(qv, 1, ef_search=40)
    assert r[0, 0] == 3
    table.delete([3])
    _, r = idx.search(qv, 1, ef_search=40)
    assert r[0, 0] != 3  # dead rows masked at scan time (like dead heap tuples)


def test_duplicates_share_elements():
    # hnsw.h:69 — up to 10 heap TIDs per element; duplicate vectors merge
    rng = np.random.default_rng(0)
    base = rng.normal(size=(50, 8)).astype(np.float32)
    db = np.concatenate([base, base[:5], base[:5]])  # 10 duplicate rows
    table = DenseTable(8)
    table.insert(db)
    idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32, wave_size=64)
    assert idx.live_elements == 50
    # searching near a duplicated vector returns all its rows
    d, r = idx.search(base[0][None, :], 3, ef_search=40)
    got = set(int(x) for x in r[0])
    assert got == {0, 50, 55}
    assert np.allclose(d[0], d[0][0])


def test_zero_vector_not_indexed_for_cosine():
    rng = np.random.default_rng(1)
    db = rng.normal(size=(100, 8)).astype(np.float32)
    db[7] = 0.0
    table = DenseTable(8)
    table.insert(db)
    idx = HNSWIndex(table, Metric.COSINE, m=8, ef_construction=32, wave_size=64)
    assert idx.live_elements == 99
    _, r = idx.search(db[:1], 99, ef_search=200)
    assert 7 not in set(r[0].tolist())


def test_ef_search_caps_results(data):
    # README.md:933-935 — without iterative scans a query returns at most
    # ef_search rows
    db, q = data
    table, idx = build(db, Metric.L2)
    d, r = idx.search(q[:2], 50, ef_search=10)
    finite = np.isfinite(d).sum(axis=1)
    assert (finite <= 10 * 10).all()  # ef elements × up to 10 tids


def test_iterative_scan_filtered(data):
    db, q = data
    table, idx = build(db, Metric.L2)
    fmask = np.zeros(table.capacity, bool)
    fmask[::20] = True  # 5% selectivity
    with config.local(**{"hnsw.iterative_scan": "relaxed_order"}):
        d, r = idx.search(q[:4], 10, ef_search=10, filter_mask=fmask)
    assert (r >= 0).sum() > 0
    assert all(x % 20 == 0 for x in r[r >= 0].ravel())
    # iterative scan finds at least as many as the plain capped scan
    d2, r2 = idx.search(q[:4], 10, ef_search=10, filter_mask=fmask)
    assert (r >= 0).sum() >= (r2 >= 0).sum()


def test_option_bounds():
    table = DenseTable(4)
    with pytest.raises(DataException, match='out of bounds for option "m"'):
        HNSWIndex(table, Metric.L2, m=1, build=False)
    with pytest.raises(DataException, match='out of bounds for option "ef_construction"'):
        HNSWIndex(table, Metric.L2, ef_construction=2000, build=False)
    with pytest.raises(DataException, match="ef_construction must be greater than or equal"):
        HNSWIndex(table, Metric.L2, m=40, ef_construction=64, build=False)


def test_bit_hnsw():
    rng = np.random.default_rng(3)
    db = rng.random((500, 64)) < 0.5
    q = rng.random((10, 64)) < 0.5
    table = BitTable(64)
    table.insert(db)
    for metric in (Metric.HAMMING, Metric.JACCARD):
        idx = HNSWIndex(table, metric, m=8, ef_construction=32, wave_size=128,
                        dedup=False)
        _, e_i = FlatIndex(table, metric).search(q, 10)
        _, r = idx.search(q, 10, ef_search=80)
        assert recall_at_k(r, e_i) >= 0.85  # hamming ties make exact-match loose


def test_sparse_hnsw():
    rng = np.random.default_rng(4)
    dense = (rng.normal(size=(400, 40)) * (rng.random((400, 40)) < 0.3)).astype(np.float32)
    dense[dense.sum(axis=1) == 0, 0] = 1.0  # avoid empty rows
    qdense = (rng.normal(size=(8, 40)) * (rng.random((8, 40)) < 0.3)).astype(np.float32)
    table = SparseTable(40, nnz_cap=32)
    table.insert([SparseVec.from_dense(r) for r in dense])
    idx = HNSWIndex(table, Metric.IP, m=8, ef_construction=32, wave_size=128)
    queries = [SparseVec.from_dense(r) for r in qdense]
    _, e_i = FlatIndex(table, Metric.IP).search(queries, 10)
    _, r = idx.search(queries, 10, ef_search=80)
    assert recall_at_k(r, e_i) >= 0.85


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE])
def test_sparse_densified_scorer_bit_identical(metric):
    """The densified-query scorer (make_scorer sdim>0 — the path every
    moderate-dim sparse search now rides, HNSWIndex._scorer_sdim) must be
    BITWISE identical to the merge-join scorer it replaces: same qv_at
    values (scatter-then-gather vs searchsorted), same last-axis f32
    reduction.  Covers CSR pads (SPARSE_PAD), empty-overlap pairs, and
    negative (masked) candidate ids."""
    from pgvector_tpu.index import hnsw_kernels as K

    rng = np.random.default_rng(17)
    n, dim, nnz, nq, r = 64, 50, 24, 6, 16
    dense = (rng.normal(size=(n, dim)) * (rng.random((n, dim)) < 0.25)
             ).astype(np.float32)
    dense[dense.sum(axis=1) == 0, 0] = 1.0
    qdense = (rng.normal(size=(nq, dim)) * (rng.random((nq, dim)) < 0.25)
              ).astype(np.float32)
    qdense[0] = 0.0  # empty query → zero overlap with everything
    table = SparseTable(dim, nnz_cap=nnz)
    table.insert([SparseVec.from_dense(v) for v in dense])
    idx = HNSWIndex(table, metric, m=4, ef_construction=8, wave_size=32,
                    build=False)
    values = idx.values  # (idx_arr, val_arr) padded CSR
    qs, _ = idx._query_rep([SparseVec.from_dense(v) for v in qdense])
    rows = rng.integers(0, n, size=(nq, r)).astype(np.int32)
    rows[:, -2:] = -1  # masked lanes must stay +inf
    d_mj = np.asarray(K.score_block("sparse", metric, values, qs,
                                    jnp.asarray(rows), sdim=0))
    d_dq = np.asarray(K.score_block("sparse", metric, values, qs,
                                    jnp.asarray(rows), sdim=dim))
    assert d_mj.dtype == d_dq.dtype == np.float32
    assert np.array_equal(d_mj, d_dq), (
        f"{metric}: densified-query scorer diverges from merge join")


def test_sparse_search_identical_across_scorers(monkeypatch):
    """End-to-end: a sparse HNSW search returns the same neighbor ids and
    ULP-equal distances whether the scan rides the densified-query scorer
    or the merge join.  Distances are compared with allclose, not
    bitwise: the two scans are *different XLA programs*, and XLA:CPU
    reassociates the same f32 lane reduction differently depending on
    what it fuses around it (measured: the merge-join scorer itself
    returns -5.7117767 inside the mono-jit scan but -5.711777 standalone
    for one pair).  Same-program bitwise identity is the kernel test
    above; cross-program identity is not an XLA contract."""
    rng = np.random.default_rng(21)
    dense = (rng.normal(size=(300, 48)) * (rng.random((300, 48)) < 0.3)
             ).astype(np.float32)
    dense[dense.sum(axis=1) == 0, 0] = 1.0
    qdense = (rng.normal(size=(8, 48)) * (rng.random((8, 48)) < 0.3)
              ).astype(np.float32)
    table = SparseTable(48, nnz_cap=32)
    table.insert([SparseVec.from_dense(v) for v in dense])
    idx = HNSWIndex(table, Metric.IP, m=8, ef_construction=32, wave_size=64)
    queries = [SparseVec.from_dense(v) for v in qdense]
    d1, r1 = idx.search(queries, 10, ef_search=40)
    monkeypatch.setattr(HNSWIndex, "_scorer_sdim", lambda self: 0)
    d0, r0 = idx.search(queries, 10, ef_search=40)
    assert np.array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-6, atol=1e-7)


def test_empty_index_search():
    table = DenseTable(8)
    idx = HNSWIndex(table, Metric.L2, build=False)
    d, r = idx.search(np.zeros((2, 8), np.float32), 5)
    assert (r == -1).all() and np.isinf(d).all()


def test_iterative_scan_resumption_contract(data):
    """test/t/043 methodology: as max_scan_tuples grows, an iterative
    filtered scan returns more matches; strict_order output is sorted and
    never larger than relaxed; resumption (not re-search) semantics mean
    the visited set persists across batches."""
    db, q = data
    table, idx = build(db, Metric.L2)
    fmask = np.zeros(table.capacity, bool)
    fmask[::25] = True  # 4% selectivity
    qs = q[:4]
    counts = []
    for cap in (20, 200, 20000):
        with config.local(**{"hnsw.iterative_scan": "relaxed_order",
                             "hnsw.max_scan_tuples": cap}):
            d, r = idx.search(qs, 20, ef_search=10, filter_mask=fmask)
        counts.append(int((r >= 0).sum()))
    assert counts[0] <= counts[1] <= counts[2]
    assert counts[2] > counts[0]
    with config.local(**{"hnsw.iterative_scan": "relaxed_order"}):
        d_rel, r_rel = idx.search(qs, 20, ef_search=10, filter_mask=fmask)
    with config.local(**{"hnsw.iterative_scan": "strict_order"}):
        d_str, r_str = idx.search(qs, 20, ef_search=10, filter_mask=fmask)
    for i in range(len(qs)):
        dd = d_str[i][np.isfinite(d_str[i])]
        assert np.all(np.diff(dd) >= 0)
    assert (r_str >= 0).sum() <= (r_rel >= 0).sum()
    # every returned row passes the filter
    for r in (r_rel, r_str):
        assert all(x % 25 == 0 for x in r[r >= 0].ravel())


def test_int8_point_scores_match_f64_oracle(rng):
    """K._int8_point_scores (the dot-form int8 slab scorer — no f32 slab
    copy may exist, it OOM'd HBM at 960-d): distances must track the f64
    oracle within the two-sided 8-bit quantization budget for L2/IP, and
    invalid rows must score inf."""
    import pgvector_tpu.index.hnsw_kernels as K

    q_n, w, dim = 8, 16, 96
    vals = rng.normal(size=(64, dim)).astype(np.float32)
    qs = rng.normal(size=(q_n, dim)).astype(np.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.asarray(vals)), axis=0),
                        1e-30) / 127.0
    v8 = np.asarray(jnp.clip(jnp.round(vals / scale), -127, 127)
                    ).astype(np.int8)
    deq = v8.astype(np.float64) * np.asarray(scale, np.float64)
    norm2 = jnp.asarray((deq ** 2).sum(axis=1).astype(np.float32))
    nbrs = rng.integers(0, 64, size=(q_n, w)).astype(np.int32)
    nbrs[:, -1] = -1
    v = jnp.asarray(v8[np.maximum(nbrs, 0)])
    for met, oracle in (
        (Metric.L2, ((qs.astype(np.float64)[:, None, :]
                      - deq[np.maximum(nbrs, 0)]) ** 2).sum(-1)),
        (Metric.IP, -(qs.astype(np.float64)[:, None, :]
                      * deq[np.maximum(nbrs, 0)]).sum(-1)),
    ):
        got = np.asarray(K._int8_point_scores(
            met, jnp.asarray(qs), scale, norm2, v, jnp.asarray(nbrs)))
        assert np.all(np.isinf(got[:, -1]))
        ok = nbrs >= 0
        # Deterministic error budget, per (query, row): the kernel rounds
        # the scale-folded query to int8 with step sq = max|q⊙s|/127, so the
        # cross term q·deq picks up at most 0.5*sq per dim weighted by the
        # row's INTEGER code magnitude |v8_d| (the dot is against codes, not
        # dequantized values).  L2 doubles the cross term; IP uses it once.
        # A small relative slack covers f32 accumulation vs the f64 oracle.
        sq = np.abs(qs * np.asarray(scale)).max(axis=1) / 127.0      # (Q,)
        row_l1 = np.abs(v8.astype(np.float64)).sum(axis=1)           # (64,)
        cross_err = 0.5 * sq[:, None] * row_l1[np.maximum(nbrs, 0)]  # (Q, W)
        factor = 2.0 if met is Metric.L2 else 1.0
        tol = factor * cross_err + 1e-4 * np.abs(oracle) + 1e-2
        assert np.all(np.abs(got[ok] - oracle[ok]) <= tol[ok])


def test_beam_wider_than_ef(data):
    """beam_expand > ef_search must degrade to expand == ef (the pool is
    only ef wide), not raise a top_k shape error — hit by the
    latency-tuned expand=40 beam at small ef (bench.py latency lane)."""
    db, q = data
    table, idx = build(db, Metric.L2)
    idx.beam_expand = 40
    d, r = idx.search(q[:8], 10, ef_search=24)
    assert r.shape == (8, 10)
    assert (r[:, 0] >= 0).all()
    assert np.all(np.diff(np.where(np.isfinite(d), d, np.inf), axis=1) >= 0)


def test_packed_scan_matches_row_gather(data, monkeypatch):
    """The adjacency-packed layer-0 scan is a gather-layout optimization —
    with f32 packing it must return EXACTLY the classic path's results
    (same pool admissions, same distances); with bf16 packing + exact
    re-rank it must stay within the recall floor."""
    db, q = data
    table, idx = build(db, Metric.L2, beam_expand=4)
    monkeypatch.setenv("PGVECTOR_TPU_PACKED_SCAN", "off")
    d0, r0 = idx.search(q, 10, ef_search=40)
    monkeypatch.setenv("PGVECTOR_TPU_PACKED_SCAN", "f32")
    d1, r1 = idx.search(q, 10, ef_search=40)
    assert np.array_equal(r0, r1)
    assert np.allclose(d0, d1, rtol=0, atol=0, equal_nan=True)
    # bf16 + rerank: same exact final distances for whatever it returns,
    # and recall stays above the build floor
    monkeypatch.setenv("PGVECTOR_TPU_PACKED_SCAN", "bf16")
    idx._nbr_vals = None
    d2, r2 = idx.search(q, 10, ef_search=80)
    _, e_i = FlatIndex(table, Metric.L2).search(q, 10)
    assert recall_at_k(r2, e_i) >= 0.92
    # re-ranked distances are exact f32 values for the returned rows
    flat_d, flat_i = FlatIndex(table, Metric.L2).search(q, 1000)
    lut = {(qi, int(r)): flat_d[qi][list(flat_i[qi]).index(r)]
           for qi in range(len(q)) for r in r2[qi] if r >= 0}
    for qi in range(len(q)):
        for j, r in enumerate(r2[qi]):
            if r >= 0:
                assert abs(d2[qi, j] - lut[(qi, int(r))]) < 1e-5
    # int8 + per-dim dequant scale + rerank: half bf16's scan bytes, same
    # contracts — recall floor holds and emitted distances are exact f32
    monkeypatch.setenv("PGVECTOR_TPU_PACKED_SCAN", "int8")
    idx._nbr_vals = None
    d3, r3 = idx.search(q, 10, ef_search=80)
    assert idx._nbr_vals.dtype == jnp.int8
    assert idx._nbr_scale.shape == (db.shape[1],)
    assert recall_at_k(r3, e_i) >= 0.92
    lut3 = {(qi, int(r)): flat_d[qi][list(flat_i[qi]).index(r)]
            for qi in range(len(q)) for r in r3[qi] if r >= 0}
    for qi in range(len(q)):
        for j, r in enumerate(r3[qi]):
            if r >= 0:
                assert abs(d3[qi, j] - lut3[(qi, int(r))]) < 1e-5


def test_packed_scan_invalidated_by_mutation(data, monkeypatch):
    """Inserts/vacuum rewrite neighbor lists — the packed copy must be
    rebuilt, not served stale."""
    db, q = data
    monkeypatch.setenv("PGVECTOR_TPU_PACKED_SCAN", "f32")
    table = DenseTable(db.shape[1])
    rows1 = table.insert(db[:800])
    idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32,
                    wave_size=128, beam_expand=4)
    idx.search(q, 5)  # builds the packed copy
    rows2 = table.insert(db[800:])
    idx.insert(rows2)
    _, e_i = FlatIndex(table, Metric.L2).search(q, 10)
    _, r = idx.search(q, 10, ef_search=80)
    assert recall_at_k(r, e_i) >= 0.92
    # new rows must be findable (stale packed copy would miss them)
    new_set = set(int(x) for x in rows2)
    assert any(int(x) in new_set for row in r for x in row)
    table.delete(rows1[:200])
    idx.vacuum()
    _, e_i = FlatIndex(table, Metric.L2).search(q, 10)
    _, r = idx.search(q, 10, ef_search=80)
    assert recall_at_k(r, e_i) >= 0.90


def test_l_unroll_derived_from_capacity_and_m():
    """hnsw.h:133 level bound, size-derived: the unroll depth must cover
    the plausible max level at any capacity without an env knob."""
    table = DenseTable(8)
    table.insert(np.zeros((4, 8), np.float32))
    # depth = highest level with ≥2 expected elements (n·m^-L ≥ 2):
    # 16M at m=16 → 5; 1M at m=16 → 4 (the level-5 population at 1M is
    # ~one element — not worth a full masked beam pass per wave)
    idx = HNSWIndex(table, Metric.L2, m=16, ef_construction=32, build=False,
                    capacity=16_000_000)
    assert idx._l_unroll == 5
    assert HNSWIndex(table, Metric.L2, m=16, ef_construction=32, build=False,
                     capacity=1_000_000)._l_unroll == 4
    assert HNSWIndex(table, Metric.L2, m=16, ef_construction=32,
                     build=False)._l_unroll >= 2
    # m=2 graphs are tall: 8k elements → clamped at L_MAX=12
    idx2 = HNSWIndex(table, Metric.L2, m=2, ef_construction=8, build=False,
                     capacity=8192)
    assert idx2._l_unroll == 12
    # growth deepens the unroll (never shrinks)
    idx3 = HNSWIndex(table, Metric.L2, m=4, ef_construction=8, build=False,
                     capacity=1024)
    before = idx3._l_unroll
    idx3.cap_e = 1024  # force a doubling chain
    for _ in range(6):
        idx3._grow()
    assert idx3._l_unroll >= before
    assert idx3._l_unroll == idx3._derive_l_unroll(idx3.cap_e)


def test_tall_graph_levels_and_descent():
    """m=2 makes multi-level graphs at small n (ml = 1/ln 2): levels must
    spread past 4 (the old static default), the entry must sit at the top
    level, and the descent through every level must still find answers."""
    rng = np.random.default_rng(44)
    db = rng.normal(size=(2000, 8)).astype(np.float32)
    table = DenseTable(8)
    table.insert(db)
    idx = HNSWIndex(table, Metric.L2, m=2, ef_construction=16,
                    wave_size=256, beam_expand=4, seed=2)
    lv = idx.levels[idx.levels >= 0]
    assert lv.max() > 4, "tall graph expected at m=2"
    assert lv.max() <= idx._l_unroll
    assert idx.entry_level == lv.max()
    # m=2 graphs are inherently sparse (2 links/level) — the floor here
    # guards the multi-level descent, not graph quality (test/t/012 floors
    # apply at m=16)
    _, e_i = FlatIndex(table, Metric.L2).search(db[:16] + 0.01, 10)
    _, r = idx.search(db[:16] + 0.01, 10, ef_search=128)
    assert recall_at_k(r, e_i) >= 0.75


def test_explicit_capacity_honored_not_pow2():
    """An explicitly-requested table capacity allocates ~that many slots
    (256-row rounded), not the next power of two — a 10M-row table must
    not silently cost 16.8M rows of HBM."""
    from pgvector_tpu.store.table import DenseTable

    t = DenseTable(8, capacity=10_000_000)
    assert t.capacity == 10_000_128
    t2 = DenseTable(8, capacity=100)  # small requests keep the 1024 floor
    assert t2.capacity == 1024


def test_insert_growth_still_doubles(rng):
    from pgvector_tpu.store.table import DenseTable

    t = DenseTable(4, capacity=1024)
    rows = t.insert(rng.normal(size=(1500, 4)).astype(np.float32))
    assert t.capacity == 2048
    assert rows[0] == 0 and rows[-1] == 1499 and t.count == 1500
    np.testing.assert_array_equal(np.asarray(t.valid[:1500]), True)
    assert not bool(np.asarray(t.valid[1500:]).any())


def test_host_loop_search_accepts_device_kwargs(data, monkeypatch):
    """The host-loop driver (PGVECTOR_TPU_HOST_LOOPS=1 — the documented
    fallback when remote device compiles are pathological) must accept the
    full device-path kwarg surface (max_steps, pallas_tail) — a signature
    drift here crashes every search under the fallback."""
    db, q = data
    table, idx = build(db, Metric.L2, beam_expand=4)
    d_dev, r_dev = idx.search(q, 10, ef_search=40)
    monkeypatch.setenv("PGVECTOR_TPU_HOST_LOOPS", "1")
    d_host, r_host = idx.search(q, 10, ef_search=40)
    _, e_i = FlatIndex(table, Metric.L2).search(q, 10)
    assert recall_at_k(r_host, e_i) >= 0.9
    # and the straggler-cap kwarg is honored, not just tolerated
    monkeypatch.setenv("PGVECTOR_TPU_QUERY_MAX_STEPS", "2")
    _, r_capped = idx.search(q, 10, ef_search=40)
    assert r_capped.shape == r_host.shape


def test_sketch_prune_restores_row_gather_recall(data, monkeypatch):
    """Hybrid two-level hop for sketched caches (K._hop_body prune): the
    JL-distorted slab scores only PRUNE each hop's candidates; survivors
    are re-scored exactly before pool admission.  With prune at half the
    hop width the emitted rows must match the exact row-gather path far
    better than sketch-only admission (which collapsed GIST-1M ef=40
    recall 0.90 → 0.42 on v5e — BENCH r4)."""
    db, q = data
    table, idx = build(db, Metric.L2)
    _, e_i = FlatIndex(table, Metric.L2).search(q, 10)
    monkeypatch.setenv("PGVECTOR_TPU_PACKED_SCAN", "off")
    _, r_gather = idx.search(q, 10, ef_search=64)
    base = recall_at_k(r_gather, e_i)
    monkeypatch.setenv("PGVECTOR_TPU_PACKED_SCAN", "sketch")
    monkeypatch.setenv("PGVECTOR_TPU_SKETCH_DIM", "32")
    monkeypatch.setenv("PGVECTOR_TPU_SKETCH_PRUNE", "8")  # half of 2m=16
    idx._nbr_vals = None
    _, r_hybrid = idx.search(q, 10, ef_search=64)
    assert recall_at_k(r_hybrid, e_i) >= base - 0.02
    # sanity: the prune knob actually routes through the kernel (pool
    # distances exact ⇒ emitted distances match the row-gather path rows)
    monkeypatch.setenv("PGVECTOR_TPU_SKETCH_PRUNE", "0")
    _, r_sk = idx.search(q, 10, ef_search=64)
    assert recall_at_k(r_hybrid, e_i) >= recall_at_k(r_sk, e_i)


def test_packed_scan_override_ignored_for_nondense(monkeypatch):
    """PGVECTOR_TPU_PACKED_SCAN=f32/bf16 only applies to dense indexes: bit
    tables store packed uint32 words and sparse tables (idx, val) pairs —
    forcing the packed layout there would feed the wrong shapes to the
    dense scorer (trace-time crash before the guard)."""
    monkeypatch.setenv("PGVECTOR_TPU_PACKED_SCAN", "f32")
    rng = np.random.default_rng(41)
    bits = rng.random((600, 64)) > 0.5
    bt = BitTable(64)
    bt.insert(bits)
    bidx = HNSWIndex(bt, Metric.HAMMING, m=8, ef_construction=32,
                     wave_size=128)
    assert bidx._packed_dtype() is None
    _, r = bidx.search(bits[:2], 3)
    assert r[0, 0] == 0


def test_visited_hash2_insert_never_evicts():
    """The 2-choice visited table's documented invariant: an insert NEVER
    evicts an occupant (ResumeScanItems depends on records persisting).
    Before the fix, pass 2 used slot-2 occupancy read before the pass-1
    scatter, so B (with slot 1 taken and slot2(B) == slot1(A), B > A)
    could scatter-max over the A that pass 1 just recorded."""
    import jax.numpy as jnp

    from pgvector_tpu.index import hnsw_kernels as K

    table = K.visited_init(1, 8)
    cap = table.shape[1]
    shift = np.uint32(32 - (cap.bit_length() - 1))
    ids = np.arange(1, 200_000, dtype=np.uint32)
    s1 = (ids * np.uint32(0x9E3779B1)) >> shift
    s2 = (ids * np.uint32(0x85EBCA77)) >> shift
    s1_of = {int(i): int(x) for i, x in zip(ids, s1)}
    s2_of = {int(i): int(x) for i, x in zip(ids, s2)}
    from collections import defaultdict

    by_s1 = defaultdict(list)
    for i, x in zip(ids, s1):
        by_s1[int(x)].append(int(i))
    triple = None
    for grp in by_s1.values():
        if len(grp) < 2:
            continue
        c, b = grp[0], grp[1]
        for a in by_s1.get(s2_of[b], []):
            if a < b and a not in (b, c) and s1_of[a] != s1_of[b]:
                triple = (c, b, a)
                break
        if triple:
            break
    assert triple, "no collision triple in range (hash changed?)"
    c, b, a = triple
    table, seen = K.visited_probe(table, jnp.asarray([[c]], jnp.int32))
    assert not bool(seen[0, 0])
    # a and b in ONE block: pass 1 records a at its empty slot 1; b's
    # slot 1 is taken by c, so pass 2 aims at slot2(b) == slot1(a)
    table, seen = K.visited_probe(table, jnp.asarray([[a, b]], jnp.int32))
    assert not seen.any()
    _, seen = K.visited_probe(table, jnp.asarray([[a, c]], jnp.int32))
    assert bool(seen[0, 0]), "A was evicted by B's stale-occupancy insert"
    assert bool(seen[0, 1])


def test_l_unroll_env_clamped_and_bit_scan_bytes(monkeypatch):
    """PGVECTOR_TPU_L_UNROLL clamps to the static L_MAX array depth (a
    larger value would silently alias the top level's neighbor lists), and
    the iterative-scan memory accounting uses the packed word width for
    bit rows, not 4 bytes/dimension (a 32x overestimate that truncated
    capped scans far too early)."""
    from pgvector_tpu.index.hnsw import L_MAX

    monkeypatch.setenv("PGVECTOR_TPU_L_UNROLL", "99")
    t = DenseTable(4)
    t.insert(np.zeros((4, 4), np.float32))
    idx = HNSWIndex(t, Metric.L2, m=4, ef_construction=16, dedup=False)
    assert idx._l_unroll == L_MAX
    monkeypatch.delenv("PGVECTOR_TPU_L_UNROLL")

    bt = BitTable(6400)
    rng = np.random.default_rng(3)
    bt.insert(rng.random((32, 6400)) > 0.5)
    bidx = HNSWIndex(bt, Metric.HAMMING, m=4, ef_construction=16)
    per_q = bidx._scan_bytes_per_query(ef=64)
    # vector copy term: 64 slots x 200 words x 4 B = 51 KB, not 1.6 MB
    assert per_q < 64 * (4 * bt.words + 9) + 4 * 1024 * 1024
    assert per_q < 500_000
