"""Ordered (btree-opclass) index — the analogue of the reference's btree
operator classes over vector values (sql/vector.sql:300-346 `vector_ops`,
810-817 `halfvec_ops`, 1180-1187 `sparsevec_ops`; behavior pinned by
test/sql/btree.sql): equality and range predicates over the memcmp-style
total ordering (values element-by-element, then dims — vector.c:1030-1143),
plus ordered scans.

Design: a sorted permutation of live row ids.  Dense rows sort by a
byte-comparable key built with the IEEE-754 total-order transform (sign
bit flip for non-negatives, full complement for negatives), which makes
lexicographic byte order equal elementwise float order — so lookups are
O(log n) bisects on a bytes list instead of compare callbacks.  Negative
zeros canonicalize to +0.0 first (float comparison treats them equal,
vector.c:1060).  Sparse rows compare as-if-dense (sparsevec.c:1189-1280),
which has no finite byte encoding at dim ≤ 1e9 — they sort by the
SparseVec compare itself.

This is a host-side structure by design: the reference's btree indexes are
also CPU-side Postgres btrees, not SIMD paths; the TPU owns distance scans,
not total-order lookups.
"""

from __future__ import annotations

import bisect
import functools
import heapq
from typing import List, Optional, Tuple

import numpy as np

from ..errors import DataException
from ..store.table import BitTable, DenseTable, SparseTable
from ..types import Bit, HalfVec, SparseVec, Vector


def _dense_keys(block: np.ndarray) -> List[bytes]:
    """IEEE-754 total-order byte keys for a (R, D) block: big-endian
    transformed uint32 per element; byte order == elementwise float order
    for finite floats.  Batched so callers pay one device→host transfer
    per block, not per row."""
    x = np.ascontiguousarray(np.atleast_2d(block), np.float32)
    x = np.where(x == 0.0, np.float32(0.0), x)  # -0.0 == +0.0 (vector.c:1060)
    bits = x.view(np.uint32)
    neg = bits >> 31 == 1
    t = np.where(neg, ~bits, bits | np.uint32(0x80000000)).astype(">u4")
    return [row.tobytes() for row in t]


def _dense_key(row: np.ndarray) -> bytes:
    return _dense_keys(np.asarray(row, np.float32)[None])[0]


def _bit_key(words: np.ndarray, dim: int) -> bytes:
    return np.asarray(words, np.uint32).astype(">u4").tobytes()


def _sparse_item_cmp(a: Tuple, b: Tuple) -> int:
    """Total order on (SparseVec key, row id) pairs (sparsevec.c:1189-1280
    as-if-dense compare, row id as tie-break)."""
    return a[0].compare(b[0]) or (a[1] - b[1])


class OrderedIndex:
    """Sorted-permutation index over a table's total value ordering.

    Supports the btree opclass surface: ``search_eq`` (=), ``search_range``
    (< <= >= > between), and ``scan`` (ORDER BY value).  Maintained online
    by ``insert``/``vacuum`` like the AM indexes."""

    def __init__(self, table, build: bool = True):
        if not isinstance(table, (DenseTable, BitTable, SparseTable)):
            raise DataException(
                f"btree does not support {type(table).__name__}")
        self.table = table
        self._keys: List = []
        self._rows: List[int] = []
        if build:
            self.build()

    # ------------------------------------------------------------------ keys
    def _row_keys(self, rows: np.ndarray) -> List:
        """Keys for a row-id batch — one device gather + host transfer for
        the whole batch (per-row transfers made build/insert O(rows) in
        dispatch latency)."""
        t = self.table
        if isinstance(t, DenseTable):
            return _dense_keys(np.asarray(t.data[rows], np.float32))
        if isinstance(t, BitTable):
            w = np.asarray(t.data[rows], np.uint32).astype(">u4")
            return [r.tobytes() for r in np.atleast_2d(w)]
        idx_b = np.atleast_2d(np.asarray(t.idx[rows]))
        val_b = np.atleast_2d(np.asarray(t.val[rows]))
        from ..ops.distance import SPARSE_PAD

        pad = int(SPARSE_PAD)
        return [
            SparseVec(t.dim, i[i != pad], v[i != pad], _checked=True)
            for i, v in zip(idx_b, val_b)
        ]

    def _row_key(self, row: int):
        return self._row_keys(np.asarray([row], np.int64))[0]

    def _value_key(self, value):
        t = self.table
        if isinstance(t, DenseTable):
            if isinstance(value, (Vector, HalfVec)):
                value = value.x
            arr = np.asarray(value, np.float32)
            if arr.shape != (t.dim,):
                raise DataException(
                    f"different vector dimensions {arr.shape[-1]} and {t.dim}")
            return _dense_key(arr)
        if isinstance(t, BitTable):
            if isinstance(value, Bit):
                value = value.bits
            arr = np.asarray(value, bool)
            if arr.shape != (t.dim,):
                raise DataException(
                    f"different bit lengths {arr.shape[-1]} and {t.dim}")
            from ..ops import distance as D
            import jax.numpy as jnp

            return _bit_key(np.asarray(D.pack_bits(jnp.asarray(arr[None]))[0]),
                            t.dim)
        if not isinstance(value, SparseVec):
            raise DataException("sparsevec btree lookups take a SparseVec")
        if value.dim != t.dim:
            raise DataException(
                f"different sparsevec dimensions {value.dim} and {t.dim}")
        return value

    # ----------------------------------------------------------------- build
    @staticmethod
    def _sort_items(items: List[Tuple]) -> None:
        """Sort (key, row-id) pairs in place; sparse keys are compare-based,
        bytes keys are memcmp — tie-break on row id for a deterministic
        scan order."""
        if items and isinstance(items[0][0], SparseVec):
            items.sort(key=functools.cmp_to_key(_sparse_item_cmp))
        else:
            items.sort()

    def build(self) -> None:
        t = self.table
        live = np.flatnonzero(np.asarray(t.valid[: t.count]))
        items = list(zip(self._row_keys(live), (int(r) for r in live)))
        self._sort_items(items)
        self._keys = [k for k, _ in items]
        self._rows = [r for _, r in items]

    # -------------------------------------------------------------- mutation
    def insert(self, rows) -> None:
        """Bulk insert: sort the batch once, then single-pass sorted-merge
        with the existing permutation — O(n + b·log b) for a b-row batch
        instead of O(n·b) per-row list.insert.  The merge keys on
        (key, row-id), preserving build()'s order within equal-key runs so
        an incrementally maintained index scans duplicates identically to
        a rebuilt one."""
        rows = np.atleast_1d(np.asarray(rows, np.int64))
        if rows.size == 0:
            return
        items = list(zip(self._row_keys(rows), (int(r) for r in rows)))
        self._sort_items(items)
        if not self._keys:
            merged = items
        elif isinstance(items[0][0], SparseVec):
            merged = list(heapq.merge(
                zip(self._keys, self._rows), items,
                key=functools.cmp_to_key(_sparse_item_cmp)))
        else:
            merged = list(heapq.merge(zip(self._keys, self._rows), items))
        self._keys = [k for k, _ in merged]
        self._rows = [r for _, r in merged]

    def vacuum(self) -> None:
        valid = np.asarray(self.table.valid)
        keep = [(k, r) for k, r in zip(self._keys, self._rows) if valid[r]]
        self._keys = [k for k, _ in keep]
        self._rows = [r for _, r in keep]

    # ----------------------------------------------------------------- scans
    def _bisect(self, key, side: str) -> int:
        if isinstance(key, SparseVec):
            lo, hi = 0, len(self._keys)
            while lo < hi:
                mid = (lo + hi) // 2
                c = self._keys[mid].compare(key)
                if c < 0 or (side == "right" and c == 0):
                    lo = mid + 1
                else:
                    hi = mid
            return lo
        fn = bisect.bisect_right if side == "right" else bisect.bisect_left
        return fn(self._keys, key)

    def _live(self, rows: List[int]) -> np.ndarray:
        valid = np.asarray(self.table.valid)
        return np.asarray([r for r in rows if valid[r]], np.int64)

    def search_eq(self, value) -> np.ndarray:
        """``column = value`` — all rows whose stored value equals, in row
        order (test/sql/btree.sql equality scans)."""
        key = self._value_key(value)
        lo = self._bisect(key, "left")
        hi = self._bisect(key, "right")
        return self._live(sorted(self._rows[lo:hi]))

    def search_range(self, lo=None, hi=None, lo_inc: bool = True,
                     hi_inc: bool = True) -> np.ndarray:
        """Range predicate over the total ordering (``>`` ``>=`` ``<``
        ``<=`` and BETWEEN compositions), rows in value order."""
        a = 0 if lo is None else self._bisect(
            self._value_key(lo), "left" if lo_inc else "right")
        b = len(self._rows) if hi is None else self._bisect(
            self._value_key(hi), "right" if hi_inc else "left")
        return self._live(self._rows[a:b])

    def scan(self, ascending: bool = True) -> np.ndarray:
        """ORDER BY column [DESC] over live rows."""
        rows = self._live(self._rows)
        return rows if ascending else rows[::-1]
