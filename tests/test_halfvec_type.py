"""Type-layer tests for ``halfvec`` — mirrors test/sql/halfvec.sql semantics."""

import numpy as np
import pytest

from pgvector_tpu import (
    HalfVec,
    Vector,
    DataException,
    InvalidTextRepresentation,
    NumericValueOutOfRange,
)


@pytest.mark.parametrize(
    "lit,out",
    [
        ("[1,2,3]", "[1,2,3]"),
        ("[-1,-2,-3]", "[-1,-2,-3]"),
        (" [ 1,  2 ,    3  ] ", "[1,2,3]"),
        ("[1.5,0.25]", "[1.5,0.25]"),
        ("[65504,-65504]", "[65504,-65504]"),  # max finite f16
        ("[1e-8,1]", "[0,1]"),  # underflow to zero ok
    ],
)
def test_text_roundtrip(lit, out):
    assert HalfVec.from_text(lit).to_text() == out


@pytest.mark.parametrize(
    "lit,exc,msg",
    [
        ("[65520,1]", NumericValueOutOfRange, "out of range for type halfvec"),
        ("[NaN,1]", DataException, "NaN not allowed in halfvec"),
        ("[Infinity,1]", DataException, "infinite value not allowed in halfvec"),
        ("[]", DataException, "at least 1 dimension"),
        ("1,2,3", InvalidTextRepresentation, "invalid input syntax"),
    ],
)
def test_text_errors(lit, exc, msg):
    with pytest.raises(exc, match=msg):
        HalfVec.from_text(lit)


def test_binary_roundtrip():
    v = HalfVec.from_text("[1.5,-2.25,300]")
    assert HalfVec.from_binary(v.to_binary()).to_text() == v.to_text()


def test_distances():
    a, b = HalfVec([0, 0]), HalfVec([3, 4])
    assert a.l2_distance(b) == 5.0
    assert HalfVec([1, 2]).inner_product(HalfVec([3, 4])) == 11.0
    assert HalfVec([1, 2]).negative_inner_product(HalfVec([3, 4])) == -11.0
    assert HalfVec([1, 0]).cosine_distance(HalfVec([0, 1])) == pytest.approx(1.0)
    assert a.l1_distance(b) == 7.0
    with pytest.raises(DataException, match="different halfvec dimensions"):
        a.l2_distance(HalfVec([1, 2, 3]))


def test_norm_normalize():
    assert HalfVec([3, 4]).norm() == 5.0
    v = HalfVec([3, 4]).l2_normalize()
    assert np.allclose(v.x.astype(np.float32), [0.6, 0.8], atol=1e-3)


def test_arithmetic_overflow():
    big = HalfVec([60000.0])
    with pytest.raises(NumericValueOutOfRange, match="overflow"):
        big + big


def test_casts():
    v = Vector([1.5, 2.25])
    h = HalfVec.from_vector(v)
    assert h.to_text() == "[1.5,2.25]"
    assert h.to_vector().to_text() == "[1.5,2.25]"
    with pytest.raises(NumericValueOutOfRange, match="out of range for type halfvec"):
        HalfVec.from_vector(Vector([1e38]))


def test_quantize_subvector_concat():
    h = HalfVec([1, -1, 0, 2])
    assert h.binary_quantize().tolist() == [True, False, False, True]
    assert h.subvector(2, 2).to_text() == "[-1,0]"
    assert HalfVec([1]).concat(HalfVec([2])).to_text() == "[1,2]"


def test_compare():
    assert HalfVec([1, 2]) < HalfVec([1, 3])
    assert HalfVec([1, 2]) == HalfVec.from_text("[1,2]")
    assert HalfVec([1, 2]) < HalfVec([1, 2, 0])


def test_halfvec_hash_eq_and_truncated_binary():
    import struct

    from pgvector_tpu.errors import DataException

    a, b = HalfVec([0.0]), HalfVec([-0.0])
    assert a == b and hash(a) == hash(b)
    with pytest.raises(DataException):
        HalfVec.from_binary(b"\x00")
    with pytest.raises(DataException):
        HalfVec.from_binary(struct.pack(">hh", 5, 0) + b"\x00" * 4)
