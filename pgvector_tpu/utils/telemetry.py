"""Observability — phase timers, build progress, memory accounting.

The reference's story (SURVEY.md §5): compile-time ``*_BENCH`` flags wrap
build phases in instr_time timers (hnsw.h:89-102, ivfflat.h:71-84),
``pg_stat_progress_create_index`` reports named phases
(hnswbuildphasename hnsw.c:117-129; ivfflatbuildphasename
ivfflat.c:64-80), and memory use is bounded by maintenance_work_mem.
Here the equivalents are runtime (no rebuild needed): a timer registry, a
progress callback protocol, and HBM-usage estimation for the store/index
arrays.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Iterator, Optional

#: hnswbuildphasename / ivfflatbuildphasename parity (hnsw.c:117-129,
#: ivfflat.c:64-80)
HNSW_PHASES = ("initializing", "loading tuples")
IVFFLAT_PHASES = (
    "initializing",
    "performing k-means",
    "assigning tuples",
    "loading tuples",
)


class Timers:
    """Accumulating phase timers — the *_BENCH instr_time analogue."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.enabled = False

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k]}
            for k, v in sorted(self.totals.items())
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


#: process-wide timer registry; enable with ``timers.enabled = True``
timers = Timers()


class Progress:
    """Build-progress reporting (pgstat_progress_update_param analogue,
    hnswbuild.c:602, 1093)."""

    def __init__(self, callback: Optional[Callable[[str, int, int], None]] = None):
        self.callback = callback or (lambda phase, done, total: None)
        self.phase = ""
        self.done = 0
        self.total = 0

    def set_phase(self, phase: str, total: int = 0) -> None:
        self.phase, self.done, self.total = phase, 0, total
        self.callback(phase, 0, total)

    def advance(self, n: int = 1) -> None:
        self.done += n
        self.callback(self.phase, self.done, self.total)


def hbm_bytes(*arrays) -> int:
    """Total bytes of the given device arrays — the explicit HBM budget
    that replaces the maintenance_work_mem cliff (hnswbuild.c:530-549)."""
    total = 0
    for a in arrays:
        if a is None:
            continue
        if isinstance(a, tuple):
            total += hbm_bytes(*a)
        else:
            total += a.size * a.dtype.itemsize
    return total


def table_hbm_bytes(table) -> int:
    parts = [getattr(table, n, None) for n in ("data", "idx", "val", "valid")]
    return hbm_bytes(*[p for p in parts if p is not None])


def hnsw_hbm_bytes(idx) -> int:
    # aliased value arrays are the table's own buffers, not index HBM
    vals = () if getattr(idx, "_alias_values", False) else idx.values
    return hbm_bytes(vals, idx.nbr0, idx.nbr_up)


def ivfflat_hbm_bytes(idx) -> int:
    return hbm_bytes(idx.centroids_f32, idx.postings_flat,
                     getattr(idx, "post_values", None),
                     getattr(idx, "post_vsq", None))
