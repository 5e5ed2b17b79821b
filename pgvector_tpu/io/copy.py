"""Bulk load/dump — the COPY analogue (reference test/sql/copy.sql tests
text and binary COPY round-trips of all four types).

Text format: one literal per line (``[1,2,3]`` / ``{1:0.5}/4`` / ``0101``).
Binary format: the per-value wire format (vector_recv/send layout)
concatenated, with a small header carrying count + kind.  Dense vector
paths use the native C++ codec when available.
"""

from __future__ import annotations

import struct
from typing import Iterable, List

import numpy as np

from .. import native
from ..errors import DataException
from ..store.table import BitTable, DenseTable, SparseTable
from ..types import Bit, SparseVec, Vector

_BIN_MAGIC = b"PGVTCOPY"


def _check_dense_range(table: DenseTable, arr: np.ndarray) -> None:
    """Values must survive narrowing to the table's storage dtype:
    DenseTable.insert casts silently, so a 70000.0 loaded into a float16
    table would store +inf and break the no-NaN/inf invariant halfvec_in
    enforces (src/halfvec.c:90-102)."""
    import jax.numpy as jnp

    dt = np.dtype(jnp.dtype(table.dtype))
    if dt.itemsize != 2:
        return
    with np.errstate(over="ignore"):
        narrowed = np.asarray(arr).astype(dt).astype(np.float32)
    bad = np.isinf(narrowed) & np.isfinite(np.asarray(arr, np.float32))
    if bad.any():
        r, c = np.argwhere(bad)[0]
        from ..errors import NumericValueOutOfRange

        raise NumericValueOutOfRange(
            f'"{float(arr[r, c])}" is out of range for type halfvec')


def copy_in_text(table, lines: Iterable[str]) -> np.ndarray:
    """Bulk insert from text literals.  Returns row ids."""
    lines = [l.strip() for l in lines if l.strip()]
    if isinstance(table, DenseTable):
        arr = native.parse_vectors(lines, expected_dim=table.dim)
        _check_dense_range(table, arr)
        return table.insert(arr)
    if isinstance(table, SparseTable):
        return table.insert([SparseVec.from_text(l) for l in lines])
    if isinstance(table, BitTable):
        return table.insert([Bit.from_text(l) for l in lines])
    raise DataException(f"cannot COPY into {type(table).__name__}")


def _bulk_sparse(table: SparseTable, live: np.ndarray):
    """Yield live rows as SparseVecs from TWO device→host transfers —
    table.get() per row costs two tiny transfers each (minutes of chatter
    at 1M rows)."""
    idx = np.asarray(table.idx[: table.count])[live]
    val = np.asarray(table.val[: table.count])[live]
    for ri, rv in zip(idx, val):
        m = ri < table.pad_index
        yield SparseVec(table.dim, ri[m], rv[m], _checked=True)


def copy_out_text(table) -> List[str]:
    """Dump live rows as text literals (row order preserved; dead rows
    skipped, like COPY seeing only live tuples)."""
    valid = np.asarray(table.valid[: table.count])
    live = np.flatnonzero(valid)
    if isinstance(table, DenseTable):
        data = np.asarray(table.data[: table.count]).astype(np.float32)[live]
        return native.format_vectors(data)
    if isinstance(table, SparseTable):
        return [sv.to_text() for sv in _bulk_sparse(table, live)]
    if isinstance(table, BitTable):
        from ..index.ivfflat import _unpack_words
        import jax.numpy as jnp

        bits = np.asarray(_unpack_words(table.data[: table.count], table.dim))[live]
        return ["".join("1" if b else "0" for b in row) for row in bits]
    raise DataException(f"cannot COPY from {type(table).__name__}")


def copy_out_binary(table) -> bytes:
    """Binary dump: header {magic, kind, count} + wire-format values."""
    valid = np.asarray(table.valid[: table.count])
    live = np.flatnonzero(valid)
    if isinstance(table, DenseTable):
        data = np.asarray(table.data[: table.count]).astype(np.float32)[live]
        body = native.encode_binary(data)
        kind = b"V"
    elif isinstance(table, SparseTable):
        body = b"".join(sv.to_binary() for sv in _bulk_sparse(table, live))
        kind = b"S"
    elif isinstance(table, BitTable):
        from ..index.ivfflat import _unpack_words

        bits = np.asarray(_unpack_words(table.data[: table.count], table.dim))[live]
        parts = []
        for row in bits:
            b = Bit(row.astype(bool))
            parts.append(struct.pack(">i", b.dim) + b.to_bytes())
        body = b"".join(parts)
        kind = b"B"
    else:
        raise DataException(f"cannot COPY from {type(table).__name__}")
    return _BIN_MAGIC + kind + struct.pack(">q", len(live)) + body


def copy_in_binary(table, data: bytes) -> np.ndarray:
    """Binary load (round-trips copy_out_binary)."""
    if data[:8] != _BIN_MAGIC:
        raise DataException("invalid binary copy data: bad magic")
    kind = data[8:9]
    (count,) = struct.unpack_from(">q", data, 9)
    body = data[17:]
    if kind == b"V":
        if not isinstance(table, DenseTable):
            raise DataException("binary data is vector, table is not dense")
        arr = native.decode_binary(body, count)
        if count and arr.shape[1] != table.dim:
            raise DataException(
                f"expected {table.dim} dimensions, not {arr.shape[1]}"
            )
        if count:
            _check_dense_range(table, arr)
        return table.insert(arr) if count else np.zeros(0, np.int32)
    if kind == b"S":
        vals = []
        off = 0
        for _ in range(count):
            dim, nnz, unused = struct.unpack_from(">iii", body, off)
            rowlen = 12 + 8 * nnz
            vals.append(SparseVec.from_binary(body[off: off + rowlen]))
            off += rowlen
        return table.insert(vals)
    if kind == b"B":
        vals = []
        off = 0
        for _ in range(count):
            (dim,) = struct.unpack_from(">i", body, off)
            nbytes = -(-dim // 8)
            vals.append(Bit.from_bytes(body[off + 4: off + 4 + nbytes], dim))
            off += 4 + nbytes
        return table.insert(vals)
    raise DataException("invalid binary copy data: unknown kind")
