"""Workload-physics guard (VERDICT r3 weak #9).

The 1M uniform[0,1)^128 lane measures recall@10 ~0.11-0.19 where the
clustered surrogate reaches 0.96+.  BASELINE.md argues this is distance
concentration (no method has a gradient to follow), not an implementation
gap.  This module keeps that claim honest with two reproducible checks:

1. the concentration statistic itself: on uniform data the 10th-nearest
   distance crowds the median pairwise distance, while clustered data keeps
   them well separated (the measured d10/median values BASELINE.md cites);

2. a *reference-equivalent simulation*: a faithful numpy implementation of
   pgvector's sequential insert path — Algorithm 1 greedy descent
   (hnswutils.c:1278-1355), Algorithm 2 ef-bounded search layer
   (hnswutils.c:822-985), Algorithm 4 select heuristic with pruned backfill
   (hnswutils.c:1062-1163), and backlink updates with prune
   (hnswutils.c:1181-1229) — built one element at a time exactly as the
   reference does.  On the same uniform workload, our wave-parallel TPU
   build matches the sequential reference build's recall: the floor follows
   the workload, not the wave restructuring.
"""

import heapq

import numpy as np
import pytest

from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import DenseTable


class SequentialRefHNSW:
    """Reference-faithful sequential HNSW (L2², in-memory) for differential
    recall tests.  Mirrors src/hnswutils.c structure at miniature scale:
    one insert at a time, per-level ef_construction searches, Algorithm 4
    selects, backlink prune at lm = (2m at level 0 else m)."""

    def __init__(self, data: np.ndarray, m: int = 8, efc: int = 32,
                 seed: int = 0):
        self.data = np.asarray(data, np.float32)
        self.m, self.efc = m, efc
        self.ml = 1.0 / np.log(m)
        self.nbrs: list = []     # per element: {level: [ids]}
        self.levels: list = []
        self.entry, self.entry_level = -1, -1
        self.rng = np.random.default_rng(seed)

    def _lm(self, lc: int) -> int:
        return 2 * self.m if lc == 0 else self.m

    def _d(self, q: np.ndarray, ids) -> np.ndarray:
        v = self.data[np.asarray(ids, np.int64)]
        diff = v - q
        return np.einsum("ij,ij->i", diff, diff)

    def _search_layer(self, q, eps, ef: int, lc: int):
        """Algorithm 2 (hnswutils.c:822-985): candidate min-heap C, result
        max-heap W, batched neighbor expansion per hop."""
        visited = set(eps)
        d0 = self._d(q, eps)
        C = list(zip(d0.tolist(), eps))
        heapq.heapify(C)
        W = [(-d, e) for d, e in C]
        heapq.heapify(W)
        while len(W) > ef:
            heapq.heappop(W)
        while C:
            dc, c = heapq.heappop(C)
            if len(W) >= ef and dc > -W[0][0]:
                break
            new = [e for e in self.nbrs[c].get(lc, ()) if e not in visited]
            if not new:
                continue
            visited.update(new)
            for de, e in zip(self._d(q, new).tolist(), new):
                if len(W) < ef or de < -W[0][0]:
                    heapq.heappush(C, (de, e))
                    heapq.heappush(W, (-de, e))
                    if len(W) > ef:
                        heapq.heappop(W)
        return sorted((-dw, e) for dw, e in W)

    def _select(self, cands, lm: int):
        """Algorithm 4 heuristic (hnswutils.c:1062-1163): keep c unless some
        kept element is closer to c than c is to q; backfill pruned."""
        kept, pruned = [], []
        for dc, c in sorted(cands):
            if len(kept) >= lm:
                break
            if kept and np.min(self._d(self.data[c],
                                       [k for _, k in kept])) < dc:
                pruned.append((dc, c))
            else:
                kept.append((dc, c))
        for dc, c in pruned:
            if len(kept) >= lm:
                break
            kept.append((dc, c))
        return kept

    def insert(self, i: int) -> None:
        q = self.data[i]
        level = min(int(-np.log(1.0 - self.rng.random()) * self.ml), 16)
        self.nbrs.append({})
        self.levels.append(level)
        if self.entry < 0:
            self.entry, self.entry_level = i, level
            return
        eps = [self.entry]
        for lc in range(self.entry_level, level, -1):
            eps = [self._search_layer(q, eps, 1, lc)[0][1]]
        for lc in range(min(level, self.entry_level), -1, -1):
            w = self._search_layer(q, eps, self.efc, lc)
            sel = self._select(w, self._lm(lc))
            self.nbrs[i][lc] = [c for _, c in sel]
            for dc, c in sel:  # backlinks with prune (HnswUpdateConnection)
                lst = self.nbrs[c].setdefault(lc, [])
                lst.append(i)
                if len(lst) > self._lm(lc):
                    ds = self._d(self.data[c], lst)
                    resel = self._select(list(zip(ds.tolist(), lst)),
                                         self._lm(lc))
                    self.nbrs[c][lc] = [e for _, e in resel]
            eps = [e for _, e in w]
        if level > self.entry_level:
            self.entry, self.entry_level = i, level

    def search(self, q: np.ndarray, k: int, ef: int) -> np.ndarray:
        eps = [self.entry]
        for lc in range(self.entry_level, 0, -1):
            eps = [self._search_layer(q, eps, 1, lc)[0][1]]
        w = self._search_layer(q, eps, ef, 0)
        return np.array([e for _, e in w[:k]], np.int64)


def _recall(approx: np.ndarray, exact: np.ndarray) -> float:
    return float(np.mean([
        len(set(map(int, a)) & set(map(int, e))) / exact.shape[1]
        for a, e in zip(approx, exact)]))


def _exact_topk(db: np.ndarray, qs: np.ndarray, k: int) -> np.ndarray:
    d = ((qs[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1)[:, :k]


def _datasets(n: int, d: int, nq: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    uni = rng.random((n + nq, d)).astype(np.float32)
    ncl = max(n // 64, 8)
    centers = rng.normal(size=(ncl, d)).astype(np.float32) * 1.5
    clu = (centers[rng.integers(0, ncl, n + nq)]
           + rng.normal(size=(n + nq, d)).astype(np.float32))
    return {"uniform": (uni[:n], uni[n:]), "clustered": (clu[:n], clu[n:])}


def test_distance_concentration_statistic():
    """The statistic BASELINE.md cites: at 1M×128-d uniform, d10 = 0.78× the
    median pairwise distance (no contrast to exploit) vs 0.49× clustered.
    The same separation shows at test scale with exact distances."""
    rng = np.random.default_rng(5)
    n, d, nq = 65_536, 128, 16
    stats = {}
    for name, db, qs in [
        ("uniform", rng.random((n, d)).astype(np.float32),
         rng.random((nq, d)).astype(np.float32)),
    ]:
        dist = np.sqrt(((qs[:, None, :] - db[None, :, :]) ** 2).sum(-1))
        d10 = np.sort(dist, axis=1)[:, 9]
        stats[name] = float(np.mean(d10 / np.median(dist, axis=1)))
    ncl = 1024
    centers = rng.normal(size=(ncl, d)).astype(np.float32) * 1.5
    db = (centers[rng.integers(0, ncl, n)]
          + rng.normal(size=(n, d)).astype(np.float32))
    qs = (centers[rng.integers(0, ncl, nq)]
          + rng.normal(size=(nq, d)).astype(np.float32))
    dist = np.sqrt(((qs[:, None, :] - db[None, :, :]) ** 2).sum(-1))
    d10 = np.sort(dist, axis=1)[:, 9]
    stats["clustered"] = float(np.mean(d10 / np.median(dist, axis=1)))
    assert stats["uniform"] > 0.70, stats
    assert stats["clustered"] < 0.60, stats
    assert stats["uniform"] - stats["clustered"] > 0.15, stats


@pytest.mark.parametrize("workload", ["clustered", "uniform"])
def test_wave_build_matches_sequential_reference(workload):
    """Differential recall: our wave-parallel build vs the sequential
    reference simulation on the SAME data/params.  Whatever recall the
    workload permits, the wave build keeps it (within noise) — the uniform
    floor is physics shared with the reference, not a wave-build defect."""
    n, d, nq, k, ef = 2048, 64, 64, 10, 40
    m, efc = 8, 32
    db, qs = _datasets(n, d, nq)[workload]
    gt = _exact_topk(db, qs, k)

    ref = SequentialRefHNSW(db, m=m, efc=efc, seed=1)
    for i in range(n):
        ref.insert(i)
    ref_rec = _recall(
        np.stack([np.pad(ref.search(q, k, ef), (0, k))[:k] for q in qs]), gt)

    table = DenseTable(d, capacity=n)
    table.insert(db)
    idx = HNSWIndex(table, Metric.L2, m=m, ef_construction=efc,
                    wave_size=256, dedup=False, seed=1)
    _, rows = idx.search(qs, k, ef_search=ef)
    ours_rec = _recall(np.asarray(rows), gt)

    if workload == "clustered":
        assert ref_rec >= 0.85, (ref_rec, ours_rec)
    assert ours_rec >= ref_rec - 0.08, (ref_rec, ours_rec)
