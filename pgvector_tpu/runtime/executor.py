"""Micro-batching query executor — the serving runtime around the kernels.

In the reference, Postgres's executor owns concurrency: each backend runs
one scan, sharing buffers under locks (SURVEY.md §1: the runtime *is*
Postgres).  A TPU serves queries efficiently only in batches, so the
equivalent here is a batching executor: concurrent callers enqueue single
queries; a dispatcher thread coalesces them into one padded device batch
per tick, runs the index's batched search, and scatters results back to
the waiting futures.

Latency/throughput knobs mirror a production server: ``max_batch`` (pad
target) and ``max_wait_ms`` (batching window).
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

import numpy as np


@dataclass
class _Pending:
    query: np.ndarray
    k: int
    future: Future = field(default_factory=Future)


class BatchingExecutor:
    """Wraps any index with a ``search(qs, k, **kw)`` batch method."""

    def __init__(self, index, max_batch: int = 256, max_wait_ms: float = 2.0,
                 **search_kwargs):
        self.index = index
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.search_kwargs = search_kwargs
        self._queue: List[_Pending] = []
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- client API
    def submit(self, query, k: int) -> Future:
        """Enqueue one query; resolves to (dists, ids) 1-D arrays."""
        q = np.asarray(query, dtype=np.float32)
        if q.ndim != 1:
            raise ValueError("submit() takes a single query vector")
        p = _Pending(q, k)
        with self._lock:
            if self._stop:
                raise RuntimeError("executor is shut down")
            self._queue.append(p)
        self._wake.set()
        return p.future

    def search(self, query, k: int, timeout: Optional[float] = 30.0):
        """Synchronous convenience wrapper."""
        return self.submit(query, k).result(timeout=timeout)

    def shutdown(self) -> None:
        with self._lock:
            self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)

    # ---------------------------------------------------------- dispatch loop
    def _drain(self) -> List[_Pending]:
        with self._lock:
            batch = self._queue[: self.max_batch]
            self._queue = self._queue[self.max_batch:]
            if not self._queue:
                self._wake.clear()
        return batch

    def _loop(self) -> None:
        while True:
            self._wake.wait(timeout=0.1)
            with self._lock:
                if self._stop and not self._queue:
                    return
                have = len(self._queue)
            if not have:
                continue
            # batching window: give co-arriving queries a chance to coalesce
            if have < self.max_batch:
                time.sleep(self.max_wait)
            batch = self._drain()
            if not batch:
                continue
            try:
                self._run(batch)
            except Exception as exc:  # propagate to all waiters
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(exc)

    def _run(self, batch: List[_Pending]) -> None:
        k_max = max(p.k for p in batch)
        qs = np.stack([p.query for p in batch])
        d, i = self.index.search(qs, k_max, **self.search_kwargs)
        for row, p in enumerate(batch):
            p.future.set_result((d[row, : p.k], i[row, : p.k]))
