"""COPY round-trip tests — ports test/sql/copy.sql (text + binary COPY of
every type)."""

import numpy as np
import pytest

from pgvector_tpu.io.copy import (
    copy_in_binary,
    copy_in_text,
    copy_out_binary,
    copy_out_text,
)
from pgvector_tpu.store.table import BitTable, DenseTable, SparseTable
from pgvector_tpu.types import Bit, SparseVec


def test_dense_text_roundtrip(rng):
    t = DenseTable(5)
    lines = ["[1,2,3,4,5]", "[0.5,-0.25,1e10,0,-0]"]
    rows = copy_in_text(t, lines)
    assert len(rows) == 2
    out = copy_out_text(t)
    assert out[0] == "[1,2,3,4,5]"
    assert out[1] == "[0.5,-0.25,1e+10,0,-0]"


def test_dense_binary_roundtrip(rng):
    t = DenseTable(8)
    data = rng.normal(size=(30, 8)).astype(np.float32)
    t.insert(data)
    t.delete([2])
    blob = copy_out_binary(t)
    t2 = DenseTable(8)
    copy_in_binary(t2, blob)
    assert t2.count == 29  # dead row skipped
    assert np.array_equal(np.asarray(t2.data[:1]), data[:1])


def test_sparse_roundtrips(rng):
    t = SparseTable(10, nnz_cap=8)
    copy_in_text(t, ["{1:1.5,3:-2}/10", "{}/10"])
    assert copy_out_text(t) == ["{1:1.5,3:-2}/10", "{}/10"]
    blob = copy_out_binary(t)
    t2 = SparseTable(10, nnz_cap=8)
    copy_in_binary(t2, blob)
    assert copy_out_text(t2) == ["{1:1.5,3:-2}/10", "{}/10"]


def test_bit_roundtrips():
    t = BitTable(9)
    copy_in_text(t, ["101010111", "000000001"])
    assert copy_out_text(t) == ["101010111", "000000001"]
    blob = copy_out_binary(t)
    t2 = BitTable(9)
    copy_in_binary(t2, blob)
    assert copy_out_text(t2) == ["101010111", "000000001"]


def test_bulk_load_speed(rng):
    # native path loads 10k literals quickly (sanity, not a benchmark)
    import time

    arr = rng.normal(size=(10000, 32)).astype(np.float32)
    from pgvector_tpu import native

    lines = native.format_vectors(arr)
    t = DenseTable(32)
    t0 = time.time()
    copy_in_text(t, lines)
    assert time.time() - t0 < 5.0
    assert t.count == 10000


def test_copy_into_f16_table_enforces_halfvec_range():
    """A literal finite in f32 but infinite after narrowing to a 16-bit
    table dtype must error like halfvec_in, not silently store +inf."""
    import jax.numpy as jnp

    from pgvector_tpu.errors import NumericValueOutOfRange

    t = DenseTable(2, dtype=jnp.float16)
    with pytest.raises(NumericValueOutOfRange, match="halfvec"):
        copy_in_text(t, ["[70000,1]"])
    # bf16 shares f32's exponent range: same literal loads fine
    t2 = DenseTable(2, dtype=jnp.bfloat16)
    rows = copy_in_text(t2, ["[70000,1]"])
    assert len(rows) == 1
