"""Cost estimation + access-path choice — the library form of pgvector's
planner hooks (hnswcostestimate src/hnsw.c:134-233, ivfflatcostestimate
src/ivfflat.c:85-151) and Postgres's index-vs-seqscan decision.

The reference returns infinite cost when a scan has no ORDER BY distance
operator (hnsw.c:147-160) — the translation here: an index path is only
offered for a matching metric, and the planner compares estimated tuple
visits (the dominant device-time proxy) across exact scan, HNSW, and
IVFFlat to pick the cheapest.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional

from .config import config
from .ops.metric import Metric


@dataclass
class Path:
    kind: str  # "exact" | "hnsw" | "ivfflat"
    index: Optional[object]
    cost: float

    def __repr__(self) -> str:
        return f"Path({self.kind}, cost={self.cost:.1f})"


def hnsw_scan_tuples(n: int, m: int, ef_search: int, entry_level: int) -> float:
    """Expected tuples visited by one HNSW scan — the reference's estimate
    (hnsw.c:197-208): entryLevel·m descent hops plus a layer-0 term
    2m·ef_search · 0.55·ln(N) / (ln(m)·(1+ln(ef_search)))."""
    if n <= 0:
        return 1.0
    layer0 = (
        2.0 * m * ef_search
        * 0.55 * math.log(max(n, 2))
        / (math.log(m) * (1.0 + math.log(max(ef_search, 2))))
    )
    return max(entry_level, 0) * m + layer0


def ivfflat_scan_tuples(n: int, lists: int, probes: int) -> float:
    """Expected tuples for an IVFFlat scan (ivfflat.c:85-151): all list
    centers plus the probed fraction of the table."""
    probes = min(probes, lists)
    return lists + n * probes / max(lists, 1)


def estimate_cost(index_or_none, table, metric: Metric,
                  ef_search: Optional[int] = None,
                  probes: Optional[int] = None) -> float:
    """Tuple-visit estimate for one access path (per query)."""
    from .index.hnsw import HNSWIndex
    from .index.ivfflat import IVFFlatIndex

    n = table.live_count
    if index_or_none is None:
        return float(max(n, 1))  # exact scan visits everything
    idx = index_or_none
    if isinstance(idx, HNSWIndex):
        ef = int(ef_search if ef_search is not None else config.get("hnsw.ef_search"))
        return hnsw_scan_tuples(n, idx.m, ef, max(idx.entry_level, 0))
    if isinstance(idx, IVFFlatIndex):
        p = int(probes if probes is not None else config.get("ivfflat.probes"))
        return ivfflat_scan_tuples(n, idx.lists, p)
    raise TypeError(f"unknown index type {type(idx).__name__}")


def choose_path(table, indexes: List[object], metric: Metric,
                order_by: bool = True, **knobs) -> Path:
    """Pick the cheapest access path for a top-k query ordered by
    ``metric``.  Without ORDER BY the approximate indexes are unusable
    (infinite cost, hnsw.c:147-160) and the exact scan wins."""
    paths = [Path("exact", None, estimate_cost(None, table, metric))]
    if order_by:
        for idx in indexes:
            if getattr(idx, "metric", None) is not metric:
                continue  # opclass mismatch → path not offered
            kind = type(idx).__name__.replace("Index", "").lower()
            paths.append(Path(kind, idx, estimate_cost(idx, table, metric, **knobs)))
    return min(paths, key=lambda p: p.cost)
