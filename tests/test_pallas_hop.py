"""Fused hop-tail kernel tests — run everywhere: the kernel
interprets on CPU backends (pallas interpret mode) and compiles on TPU."""

import pytest

def test_pallas_hop_tail_matches_xla_tail(monkeypatch):
    """The fused hop tail must return BIT-IDENTICAL pools to the unfused
    XLA tail (the (key, position) comparators reproduce stable-sort
    semantics exactly), across the full packed query path."""
    import numpy as np

    from pgvector_tpu.index.flat import FlatIndex
    from pgvector_tpu.index.hnsw import HNSWIndex
    from pgvector_tpu.ops.metric import Metric
    from pgvector_tpu.store.table import DenseTable

    rng = np.random.default_rng(55)
    db = rng.normal(size=(3000, 16)).astype(np.float32)
    # inject duplicates so the dedup branch is exercised
    db[100:110] = db[0:10]
    table = DenseTable(16)
    table.insert(db)
    idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32,
                    wave_size=256, beam_expand=4, dedup=False)
    q = db[:12] + 0.01
    monkeypatch.setenv("PGVECTOR_TPU_PACKED_SCAN", "f32")
    monkeypatch.setenv("PGVECTOR_TPU_VISITED", "off")
    monkeypatch.setenv("PGVECTOR_TPU_PALLAS_TAIL", "0")
    d0, r0 = idx.search(q, 10, ef_search=48)
    monkeypatch.setenv("PGVECTOR_TPU_PALLAS_TAIL", "1")
    d1, r1 = idx.search(q, 10, ef_search=48)
    assert np.array_equal(r0, r1)
    assert np.array_equal(d0, d1)


def test_pallas_hop_tail_unit():
    """Direct kernel unit check against a numpy oracle: dedup keeps the
    pool copy (flag preserved), masked/dup lanes sort out, first-ef order
    equals a stable sort by distance."""
    import numpy as np

    from pgvector_tpu.ops.pallas_hop import hop_tail

    rng = np.random.default_rng(9)
    q, ef, w = 5, 8, 24
    pool_d = np.sort(rng.random((q, ef)).astype(np.float32), axis=1)
    pool_i = rng.permutation(1000)[: q * ef].reshape(q, ef).astype(np.int32)
    pool_x = rng.random((q, ef)) > 0.5
    pool_p = pool_i * 2 + pool_x.astype(np.int32)
    cand_i = rng.integers(0, 1000, size=(q, w)).astype(np.int32)
    cand_i[:, 3] = pool_i[:, 0]     # duplicate of a pool entry
    cand_i[:, 5] = cand_i[:, 4]     # duplicate candidate pair
    cand_i[:, 7] = -1               # masked
    cand_d = rng.random((q, w)).astype(np.float32)
    cand_d[:, 3] = pool_d[:, 0]     # same id → same distance
    cand_d[:, 5] = cand_d[:, 4]
    cand_d[:, 7] = np.inf
    d, p = hop_tail(pool_d, pool_p, cand_d, cand_i, ef, w)
    d, p = np.asarray(d), np.asarray(p)
    for r in range(q):
        # numpy oracle: stable sort of [pool|cands] by distance with
        # later duplicates dropped
        ids = np.concatenate([pool_i[r], cand_i[r]])
        ds = np.concatenate([pool_d[r], cand_d[r]])
        ps = np.concatenate([pool_p[r], cand_i[r] * 2])
        keep, seen = [], set()
        for j in range(len(ids)):
            if ids[j] < 0 or not np.isfinite(ds[j]):
                continue
            if int(ids[j]) in seen:
                continue
            seen.add(int(ids[j]))
            keep.append(j)
        order = sorted(keep, key=lambda j: (ds[j], j))[:ef]
        want_d = [ds[j] for j in order]
        want_p = [ps[j] for j in order]
        got_d = d[r][np.isfinite(d[r])]
        got_p = p[r][: len(got_d)]
        assert np.allclose(got_d, want_d), r
        assert list(got_p) == [int(x) for x in want_p], r
