"""Work-item decomposition invariants for the IVF inverted probe scan.

The scan kernel (`_workitem_probe_topk`) is exact only if the host-side
builder (`_build_work_items`) satisfies three contracts, checked here on
skewed synthetic shapes:

1. *coverage*: every (query, non-empty probed list) edge appears in
   exactly ``windows(list)`` work items — one per slab window — so every
   posting slot of every probed list is scored exactly once per query
   (no missed slots, no duplicate candidates; duplicates would surface
   the same row id twice in one result row).
2. *geometry*: window block ranges stay inside their list's compact
   block span (``wlen`` masks short tails; blkbase+Wb never silently
   crosses into the next list).
3. *qmap*: every mapped work position holds that query's id in ``eq``.

Reference behavior being preserved: ivfscan.c:123-187 scans each probed
list's pages exactly once per query.
"""

import numpy as np
import pytest

from pgvector_tpu.index.ivfflat import _build_work_items


def _geometry(lens, cs):
    occ = (np.asarray(lens) + cs - 1) // cs
    bs = np.zeros(len(lens) + 1, np.int64)
    bs[1:] = np.cumsum(occ)
    return bs, occ


@pytest.mark.parametrize("cs,Qc,Wb", [(512, 64, 2), (8, 4, 2), (128, 8, 1)])
def test_edge_coverage_exact(cs, Qc, Wb):
    rng = np.random.default_rng(3)
    lens = np.array([0, 1, 7 * cs + 3, cs, 2 * cs - 1, 5, 0, 12 * cs])
    bs, occ = _geometry(lens, cs)
    nq, probes = 37, 5
    sel = rng.integers(0, len(lens), size=(nq, probes))
    out = _build_work_items(sel, bs, occ, Qc, Wb)
    eq, blkbase, wlen, qmap = out
    win = (occ + Wb - 1) // Wb

    # per (query, list): count how many work slots hold this query with a
    # window of that list
    R = eq.shape[0]
    rows, slots = np.nonzero(eq >= 0)
    got = {}
    for r, s in zip(rows, slots):
        # which list does this row's window belong to?
        lid = int(np.searchsorted(bs, blkbase[r], side="right") - 1)
        got[(int(eq[r, s]), lid)] = got.get((int(eq[r, s]), lid), 0) + 1
    for q in range(nq):
        for lid in sel[q]:
            lid = int(lid)
            expect = int(win[lid])
            key = (q, lid)
            # sel may repeat a list for one query (iterative windows never
            # do, but the builder must still count each edge separately)
            dup = int((sel[q] == lid).sum())
            if expect == 0:
                assert key not in got
            else:
                assert got.get(key, 0) == expect * dup, (q, lid, got.get(key))


@pytest.mark.parametrize("cs,Qc,Wb", [(512, 64, 2), (8, 4, 4)])
def test_window_geometry_and_qmap(cs, Qc, Wb):
    rng = np.random.default_rng(5)
    lens = rng.integers(0, 9 * cs, size=30)
    bs, occ = _geometry(lens, cs)
    nq = 64
    sel = rng.integers(0, len(lens), size=(nq, 7))
    out = _build_work_items(sel, bs, occ, Qc, Wb)
    if out is None:
        pytest.skip("all probed lists empty")
    eq, blkbase, wlen, qmap = out
    live = blkbase >= 0
    # each live window sits inside its list's block span; wlen covers
    # exactly the remaining blocks (no over- or under-masking)
    for r in np.flatnonzero(live):
        lid = int(np.searchsorted(bs, blkbase[r], side="right") - 1)
        off = blkbase[r] - bs[lid]
        assert 0 <= off < occ[lid]
        assert wlen[r] == min(Wb, occ[lid] - off)
    assert (wlen[~live] == 0).all()
    # qmap positions hold the right query
    Qc_ = eq.shape[1]
    for q in range(nq):
        for p in qmap[q][qmap[q] >= 0]:
            assert eq[p // Qc_, p % Qc_] == q


def test_all_empty_lists_returns_none():
    lens = np.zeros(4, np.int64)
    bs, occ = _geometry(lens, 8)
    sel = np.zeros((3, 2), np.int64)
    assert _build_work_items(sel, bs, occ, 4, 2) is None


def test_adaptive_item_shape_10m_regression():
    """The fixed (Qc=64, Wb=2) shape tripled the work-item count at
    10M/4000 lists/probes=63 (measured 394 vs 3,776 qps at probes=40);
    the adaptive shape must (a) leave the tuned 1M/probes=10 config
    unchanged and (b) cut the item count on the 10M-shaped distribution."""
    from pgvector_tpu.index.ivfflat import (_adaptive_item_shape,
                                            _build_work_items)
    rng = np.random.default_rng(9)

    # 1M-shaped: 1000 lists x ~2 blocks, probes=10, 4000 queries
    occ_1m = np.full(1000, 2, np.int64)
    sel_1m = rng.integers(0, 1000, size=(4000, 10))
    qc, wb = _adaptive_item_shape(sel_1m.reshape(-1), occ_1m, 512, 64, 1024)
    assert (qc, wb) == (64, 2)

    # 10M-shaped: 4000 lists x ~5 blocks, probes=63, 4000 queries
    occ_10m = np.clip(rng.poisson(5, 4000), 1, None).astype(np.int64)
    bs = np.zeros(4001, np.int64)
    bs[1:] = np.cumsum(occ_10m)
    sel_10m = rng.integers(0, 4000, size=(4000, 63))
    qc2, wb2 = _adaptive_item_shape(sel_10m.reshape(-1), occ_10m, 512, 64, 1024)
    assert qc2 >= 128 and wb2 >= 4

    def n_items(qc_, wb_):
        eq, blkbase, wlen, qmap = _build_work_items(
            sel_10m, bs[:-1], occ_10m, qc_, wb_)
        return int((blkbase >= 0).sum())

    fixed, adaptive = n_items(64, 2), n_items(qc2, wb2)
    assert adaptive * 2 <= fixed, (fixed, adaptive)
