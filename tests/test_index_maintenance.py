"""Insert/vacuum maintenance coverage for non-dense index kinds (the
vacuum-recall methodology of test/t/014/022/026/030 applied to bit and
sparse HNSW)."""

import numpy as np
import pytest

from pgvector_tpu.config import config
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


def test_maintenance_work_mem_notice(rng):
    """test/t/045 spirit: a tiny build budget fires the NOTICE and the
    build degrades (smaller waves) instead of failing — the TPU analogue of
    hnswbuild.c:538-543's memory cliff."""
    from pgvector_tpu.config import config
    from pgvector_tpu.store.table import DenseTable

    msgs = []
    db = rng.normal(size=(400, 16)).astype(np.float32)
    table = DenseTable(16, capacity=400)
    table.insert(db)
    with config.local(maintenance_work_mem=2 * 1024**2):
        idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32,
                        wave_size=256, dedup=False, notice_hook=msgs.append)
    assert any("maintenance_work_mem" in m for m in msgs)
    assert idx._wave_eff < 256
    _, e = FlatIndex(table, Metric.L2).search(db[:5], 10)
    _, r = idx.search(db[:5], 10, ef_search=64)
    assert recall(r, e) >= 0.9
    # ample budget: full wave, no notice
    msgs2 = []
    idx2 = HNSWIndex(table, Metric.L2, m=8, ef_construction=32,
                     wave_size=256, dedup=False, notice_hook=msgs2.append)
    assert idx2._wave_eff == 256 and not msgs2


def test_vacuum_repairs_upper_levels(rng):
    """Deleting all of an element's upper-level neighbors must leave the
    element re-linked at that level after vacuum (NeedsUpdated checks every
    layer, hnswvacuum.c:178-220) so greedy descent still reaches it."""
    from pgvector_tpu.store.table import DenseTable

    db = rng.normal(size=(400, 8)).astype(np.float32)
    table = DenseTable(8, capacity=400)
    table.insert(db)
    idx = HNSWIndex(table, Metric.L2, m=4, ef_construction=16,
                    wave_size=64, dedup=False)
    lv = idx.levels[: idx.n_elems]
    nbr_up = np.asarray(idx.nbr_up)
    # pick a level>=1 element (not the entry) whose level-1 list is non-empty
    target, nbrs = None, None
    for e in np.flatnonzero(lv >= 1):
        if int(e) == idx.entry:
            continue
        cand = np.unique(nbr_up[int(idx.up_slot[e])].ravel())
        cand = cand[cand >= 0]
        if len(cand):
            target, nbrs = int(e), cand
            break
    assert target is not None
    kill_rows = np.concatenate(
        [idx.elem_rows[e][idx.elem_rows[e] >= 0] for e in nbrs]
    )
    table.delete(kill_rows)
    idx.vacuum()
    # upper list repaired: non-empty and every neighbor live
    lst = np.asarray(idx.nbr_up[int(idx.up_slot[target])][0])
    live = lst[lst >= 0]
    assert len(live) > 0
    assert all(idx.levels[e] >= 0 for e in live)
    idx.vacuum()  # idempotent second pass
    tgt_row = int(idx.elem_rows[target][0])
    _, r = idx.search(db[tgt_row][None, :], 1, ef_search=40)
    assert int(r[0, 0]) == tgt_row


def test_sparse_wave_clamp_is_structural_no_notice(rng):
    """Sparse builds clamp waves/merge chunks to the pairwise-transient HBM
    bound (merge-join gathers defeat XLA fusion — a 1024-row sparse wave
    compile-OOM'd at 36.5 GB on v5e).  The clamp is structural, NOT the
    maintenance_work_mem cliff, so the reference's memory NOTICE
    (hnswbuild.c:538-543) must not fire for it.  L1 pins the merge-join
    path (no matmul form — hnsw._pair_sdim); IP at small dim rides the
    densified-select path whose far smaller (C, dim) transients must lift
    the clamp entirely."""
    from pgvector_tpu.store.table import SparseTable
    from pgvector_tpu.types.sparsevec import SparseVec

    n, dim, nnz = 600, 200, 8
    idx = np.sort(
        np.argpartition(rng.random((n, dim)), nnz, axis=1)[:, :nnz], axis=1
    ).astype(np.int32)
    val = rng.normal(size=(n, nnz)).astype(np.float32)
    val[val == 0] = 1.0
    table = SparseTable(dim, nnz_cap=nnz, capacity=n)
    table.insert([SparseVec(dim, idx[i], val[i], _checked=True)
                  for i in range(n)])
    msgs = []
    h = HNSWIndex(table, Metric.L1, m=8, ef_construction=32,
                  wave_size=1024, dedup=False, notice_hook=msgs.append)
    cap = h._sparse_pair_rows_cap()
    assert h._wave_eff <= cap < 1024
    # pow2 and bounded by the 2 GB merge-join transient model
    c = ((32 + 8 + 127) // 128) * 128
    lanes = ((nnz + 127) // 128) * 128
    assert cap * c * c * lanes * 8 <= (2 << 30)
    assert not any("maintenance_work_mem" in m for m in msgs)
    # graph is still functional
    _, r = h.search([SparseVec(dim, idx[0], val[0], _checked=True)], 3)
    assert r[0, 0] >= 0
    # densified-select path (IP, dim·4 < C·lanes·8): (C, dim) scatter
    # blocks shrink per-row transients ~80× here, so the 2 GB bound no
    # longer forces a sub-wave clamp at this scale
    h_ip = HNSWIndex(table, Metric.IP, m=8, ef_construction=32,
                     wave_size=1024, dedup=False, notice_hook=msgs.append)
    cap_ip = h_ip._sparse_pair_rows_cap()
    assert h_ip._pair_sdim() == dim
    assert cap_ip >= 1024 and h_ip._wave_eff == 1024
    per_row = c * dim * 4 * 2 + 4 * c * c
    assert cap_ip * per_row <= (2 << 30)
    # hnsw.sparse_pair_bytes overrides the transient bound (axon worker
    # hard-crash mitigation, round-3 session 6; the env var
    # PGVECTOR_TPU_SPARSE_PAIR_BYTES seeds this knob once at import): a
    # smaller budget must yield a smaller power-of-two cap honoring it.
    with config.local(**{"hnsw.sparse_pair_bytes": 64 << 20}):
        small = h._sparse_pair_rows_cap()
        assert small <= cap
        assert small * c * c * lanes * 8 <= (64 << 20) or small == 1
