"""Native C++ bulk codec tests — semantics identical to the Python value
layer (vector_in/out/recv/send parity) at bulk speed."""

import numpy as np
import pytest

from pgvector_tpu import native
from pgvector_tpu.errors import (
    DataException,
    InvalidTextRepresentation,
    NumericValueOutOfRange,
)
from pgvector_tpu.types import Vector


def test_native_available():
    # g++ is in this image; the codec must actually build
    assert native.available()


def test_parse_matches_python(rng):
    arr = rng.normal(size=(200, 7)).astype(np.float32)
    lits = [Vector(r, _checked=True).to_text() for r in arr]
    out = native.parse_vectors(lits)
    assert out.shape == (200, 7)
    assert np.array_equal(out, arr)


def test_format_matches_python(rng):
    arr = rng.normal(size=(100, 5)).astype(np.float32) * np.power(10.0, rng.integers(-8, 8, size=(100, 5)).astype(np.float64))
    lits = native.format_vectors(arr)
    expect = [Vector(r, _checked=True).to_text() for r in arr.astype(np.float32)]
    assert lits == expect


def test_format_special_values():
    arr = np.array([[0.0, -0.0, 1.5e38, 1.5e-38, 123456.0]], np.float32)
    assert native.format_vectors(arr) == ["[0,-0,1.5e+38,1.5e-38,123456]"]


def test_parse_errors():
    with pytest.raises(InvalidTextRepresentation):
        native.parse_vectors(["[1,2", "[1,2]"])
    with pytest.raises(DataException, match="NaN"):
        native.parse_vectors(["[NaN,1]"])
    with pytest.raises(DataException, match="infinite"):
        native.parse_vectors(["[Infinity]"])
    with pytest.raises(NumericValueOutOfRange):
        native.parse_vectors(["[4e38]"])
    with pytest.raises(DataException, match="dimension"):
        native.parse_vectors(["[1,2]", "[1,2,3]"])


def test_binary_roundtrip(rng):
    arr = rng.normal(size=(50, 9)).astype(np.float32)
    blob = native.encode_binary(arr)
    # row layout matches the scalar wire format (vector_send)
    assert blob[: 4 + 36] == Vector(arr[0], _checked=True).to_binary()
    out = native.decode_binary(blob, 50)
    assert np.array_equal(out, arr)


def test_roundtrip_through_text(rng):
    arr = rng.normal(size=(50, 4)).astype(np.float32)
    again = native.parse_vectors(native.format_vectors(arr))
    assert np.array_equal(again, arr)


def test_decode_binary_bounds_truncated_input():
    """Wire data is untrusted: truncated or count-inflated binary input
    raises DataException instead of reading past the buffer (the C decode
    used to walk count*(4+4*dim) bytes unconditionally)."""
    from pgvector_tpu.errors import DataException

    a = native.parse_vectors(["[1,2,3]", "[4,5,6]"])
    enc = native.encode_binary(a)
    np.testing.assert_array_equal(native.decode_binary(enc, 2), a)
    for cut in (0, 1, 3, 5, len(enc) - 1):
        with pytest.raises(DataException):
            native.decode_binary(enc[:cut], 2)
    with pytest.raises(DataException):
        native.decode_binary(enc, 1000)


def test_parse_vectors_empty_returns_empty():
    assert native.parse_vectors([]).shape == (0, 0)
    assert native.parse_vectors([], expected_dim=5).shape == (0, 5)


def test_hex_float_literals_parse_like_strtof():
    """'0x1p+1' is one strtof token (2.0) — the decimal regex branch used
    to claim the leading '0' and error on the rest, diverging from the
    native codec's real strtof."""
    assert Vector.from_text("[0x1p+1]").x[0] == 2.0
    assert Vector.from_text("[0xA]").x[0] == 10.0
    if native.available():
        got = native.parse_vectors(["[0x1p+1,0xA]"])
        np.testing.assert_array_equal(got[0], [2.0, 10.0])
