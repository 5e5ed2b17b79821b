"""HBM-resident vector tables — the storage layer replacing Postgres heap
pages + TOAST (SURVEY.md §7 design stance).

Each table is a set of padded device arrays with power-of-two capacity:

- :class:`DenseTable` — ``float32`` / ``bfloat16`` / ``float16`` [cap, D]
  (the ``vector`` / ``halfvec`` column analogue)
- :class:`BitTable` — packed ``uint32`` [cap, D/32] (the ``bit`` column)
- :class:`SparseTable` — CSR-in-dense-pad ``int32``/``float32`` [cap, P]
  (the ``sparsevec`` column, SURVEY.md §7 core translations)

Rows are addressed by their insertion index (the heap TID analogue); deletes
flip a validity mask (dead tuples), and indexes consult the mask the way
index scans consult the heap.  Appends grow by doubling — the functional-JAX
replacement for relation extension.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import DataException
from ..types import Vector, HalfVec, SparseVec, Bit


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _initial_cap(requested: int) -> int:
    """Explicitly-requested capacities are honored (rounded up to a
    256-row multiple for lane alignment) instead of pow2-padded: a
    10M-row table allocates 10,000,128 slots, not 16.8M (a 3.4 GB
    saving at 128-d f32).  Growth past the initial capacity still
    doubles (relation-extension analogue)."""
    return max(-(-requested // 256) * 256, 1024)


@jax.jit
def _mask_rows(mask: jnp.ndarray, rows: jnp.ndarray, value: bool) -> jnp.ndarray:
    return mask.at[rows].set(value)


@partial(jax.jit, donate_argnums=(0, 1))
def _append_block(datas, mask, blocks, start):
    """Contiguous append of ``blocks`` at ``start`` with buffer donation:
    XLA updates the (potentially multi-GB) storage arrays in place instead
    of materializing input+output copies — without donation a 10M×128-d
    insert transiently needs 2× the table bytes and OOMs 16 GB HBM."""
    datas = tuple(
        jax.lax.dynamic_update_slice(d, b, (start,) + (0,) * (d.ndim - 1))
        for d, b in zip(datas, blocks)
    )
    ones = jnp.ones(blocks[0].shape[0], dtype=bool)
    mask = jax.lax.dynamic_update_slice(mask, ones, (start,))
    return datas, mask


class BaseTable:
    """Shared row bookkeeping: count, capacity, validity mask."""

    def __init__(self, capacity: int):
        self.count = 0
        self.capacity = capacity
        self.valid = jnp.zeros(capacity, dtype=bool)

    def __len__(self) -> int:
        return self.count

    @property
    def live_count(self) -> int:
        return int(jnp.sum(self.valid))

    def delete(self, rows: Union[int, Sequence[int], np.ndarray]) -> None:
        """Mark rows dead (the DELETE analogue; reclamation happens at
        vacuum, like Postgres dead tuples)."""
        rows = jnp.atleast_1d(jnp.asarray(rows, dtype=jnp.int32))
        self.valid = _mask_rows(self.valid, rows, False)

    def _grow_mask(self, new_cap: int) -> None:
        self.valid = jnp.concatenate(
            [self.valid, jnp.zeros(new_cap - self.capacity, dtype=bool)]
        )
        self.capacity = new_cap


class DenseTable(BaseTable):
    """Dense vector column.  ``dtype=float32`` for ``vector``;
    ``bfloat16`` (default for halfvec — TPU-native 16-bit) or ``float16``."""

    def __init__(self, dim: int, dtype=jnp.float32, capacity: int = 1024):
        if dim < 1:
            raise DataException("vector must have at least 1 dimension")
        super().__init__(_initial_cap(capacity))
        self.dim = dim
        self.dtype = dtype
        self.data = jnp.zeros((self.capacity, dim), dtype=dtype)

    def _coerce(self, vectors) -> np.ndarray:
        if isinstance(vectors, (Vector, HalfVec)):
            vectors = vectors.x[None, :]
        elif isinstance(vectors, (list, tuple)) and vectors and isinstance(
            vectors[0], (Vector, HalfVec)
        ):
            vectors = np.stack([v.x for v in vectors])
        arr = np.asarray(vectors)
        if arr.ndim == 1:
            arr = arr[None, :]
        if arr.shape[1] != self.dim:
            raise DataException(
                f"expected {self.dim} dimensions, not {arr.shape[1]}"
            )
        return arr

    def insert(self, vectors) -> np.ndarray:
        """Append rows; returns their row ids."""
        arr = self._coerce(vectors)
        n = arr.shape[0]
        start = self.count
        if start + n > self.capacity:
            new_cap = _next_pow2(start + n)
            self.data = jnp.concatenate(
                [self.data, jnp.zeros((new_cap - self.capacity, self.dim), self.dtype)]
            )
            self._grow_mask(new_cap)
        (self.data,), self.valid = _append_block(
            (self.data,), self.valid,
            (jnp.asarray(arr, dtype=self.dtype),), np.int32(start),
        )
        self.count = start + n
        return np.arange(start, start + n, dtype=np.int32)

    def get(self, row: int) -> np.ndarray:
        return np.asarray(self.data[row])


class BitTable(BaseTable):
    """Packed bit column: uint32 words, MSB-first (ops.distance.pack_bits)."""

    def __init__(self, dim: int, capacity: int = 1024):
        if dim < 1:
            raise DataException("bit must have at least 1 dimension")
        super().__init__(_initial_cap(capacity))
        self.dim = dim
        self.words = -(-dim // 32)
        self.data = jnp.zeros((self.capacity, self.words), dtype=jnp.uint32)

    def _coerce(self, bits) -> np.ndarray:
        if isinstance(bits, Bit):
            bits = bits.bits[None, :]
        elif isinstance(bits, (list, tuple)) and bits and isinstance(bits[0], Bit):
            bits = np.stack([b.bits for b in bits])
        arr = np.asarray(bits, dtype=bool)
        if arr.ndim == 1:
            arr = arr[None, :]
        if arr.shape[1] != self.dim:
            raise DataException(
                f"different bit lengths {self.dim} and {arr.shape[1]}"
            )
        return arr

    def insert(self, bits) -> np.ndarray:
        from ..ops.distance import pack_bits

        arr = self._coerce(bits)
        packed = np.asarray(pack_bits(jnp.asarray(arr)))
        n = packed.shape[0]
        start = self.count
        if start + n > self.capacity:
            new_cap = _next_pow2(start + n)
            self.data = jnp.concatenate(
                [self.data, jnp.zeros((new_cap - self.capacity, self.words), jnp.uint32)]
            )
            self._grow_mask(new_cap)
        (self.data,), self.valid = _append_block(
            (self.data,), self.valid, (jnp.asarray(packed),), np.int32(start)
        )
        self.count = start + n
        return np.arange(start, start + n, dtype=np.int32)


class SparseTable(BaseTable):
    """Sparse column: fixed-width padded CSR rows.  ``nnz_cap`` is the
    per-row slot budget (rows with more nonzeros than slots error, the
    analogue of the 16,000-nnz limit src/sparsevec.h:12)."""

    def __init__(self, dim: int, nnz_cap: int = 128, capacity: int = 1024):
        if dim < 1:
            raise DataException("sparsevec must have at least 1 dimension")
        super().__init__(_initial_cap(capacity))
        from ..ops.distance import SPARSE_PAD

        self.dim = dim
        self.nnz_cap = nnz_cap
        self.pad_index = int(SPARSE_PAD)
        self.idx = jnp.full((self.capacity, nnz_cap), self.pad_index, dtype=jnp.int32)
        self.val = jnp.zeros((self.capacity, nnz_cap), dtype=jnp.float32)

    def insert(self, vectors: Sequence[SparseVec]) -> np.ndarray:
        if isinstance(vectors, SparseVec):
            vectors = [vectors]
        n = len(vectors)
        idx_block = np.full((n, self.nnz_cap), self.pad_index, dtype=np.int32)
        val_block = np.zeros((n, self.nnz_cap), dtype=np.float32)
        for r, sv in enumerate(vectors):
            if sv.dim != self.dim:
                raise DataException(
                    f"expected {self.dim} dimensions, not {sv.dim}"
                )
            if sv.nnz > self.nnz_cap:
                raise DataException(
                    f"sparsevec cannot have more than {self.nnz_cap} non-zero elements for this table"
                )
            idx_block[r, : sv.nnz] = sv.indices
            val_block[r, : sv.nnz] = sv.values
        start = self.count
        if start + n > self.capacity:
            new_cap = _next_pow2(start + n)
            self.idx = jnp.concatenate(
                [self.idx, jnp.full((new_cap - self.capacity, self.nnz_cap),
                                    self.pad_index, jnp.int32)]
            )
            self.val = jnp.concatenate(
                [self.val, jnp.zeros((new_cap - self.capacity, self.nnz_cap), jnp.float32)]
            )
            self._grow_mask(new_cap)
        (self.idx, self.val), self.valid = _append_block(
            (self.idx, self.val), self.valid,
            (jnp.asarray(idx_block), jnp.asarray(val_block)), np.int32(start),
        )
        self.count = start + n
        return np.arange(start, start + n, dtype=np.int32)

    def get(self, row: int) -> SparseVec:
        idx = np.asarray(self.idx[row])
        val = np.asarray(self.val[row])
        live = idx < self.pad_index
        return SparseVec(self.dim, idx[live], val[live], _checked=True)
