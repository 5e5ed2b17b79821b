"""Type-layer golden tests for ``vector`` — ports the methodology of
reference test/sql/vector_type.sql + test/expected/vector_type.out."""

import math

import numpy as np
import pytest

from pgvector_tpu import (
    Vector,
    DataException,
    InvalidTextRepresentation,
    NumericValueOutOfRange,
    ProgramLimitExceeded,
    avg,
    vec_sum,
)


# -- text input/output (vector_type.out:1-120) ----------------------------
@pytest.mark.parametrize(
    "lit,out",
    [
        ("[1,2,3]", "[1,2,3]"),
        ("[-1,-2,-3]", "[-1,-2,-3]"),
        ("[1.,2.,3.]", "[1,2,3]"),
        (" [ 1,  2 ,    3  ] ", "[1,2,3]"),
        ("[1.23456]", "[1.23456]"),
        ("[1.5e38,-1.5e38]", "[1.5e+38,-1.5e+38]"),
        ("[1.5e+38,-1.5e+38]", "[1.5e+38,-1.5e+38]"),
        ("[1.5e-38,-1.5e-38]", "[1.5e-38,-1.5e-38]"),
        ("[1e-46,1]", "[0,1]"),
        ("[-1e-46,1]", "[-0,1]"),
        ("[0.5, 0.25]", "[0.5,0.25]"),
        ("[100000,0.0001]", "[100000,0.0001]"),
    ],
)
def test_text_roundtrip(lit, out):
    assert Vector.from_text(lit).to_text() == out


@pytest.mark.parametrize(
    "lit,exc,msg",
    [
        ("[hello,1]", InvalidTextRepresentation, "invalid input syntax"),
        ("[NaN,1]", DataException, "NaN not allowed in vector"),
        ("[Infinity,1]", DataException, "infinite value not allowed in vector"),
        ("[-Infinity,1]", DataException, "infinite value not allowed in vector"),
        ("[4e38,1]", NumericValueOutOfRange, '"4e38" is out of range for type vector'),
        ("[-4e38,1]", NumericValueOutOfRange, '"-4e38" is out of range for type vector'),
        ("[1,2,3", InvalidTextRepresentation, "invalid input syntax"),
        ("[1,2,3]9", InvalidTextRepresentation, "Junk after closing right brace"),
        ("1,2,3", InvalidTextRepresentation, 'must start with "\\["'),
        ("", InvalidTextRepresentation, "invalid input syntax"),
        ("[", InvalidTextRepresentation, "invalid input syntax"),
        ("[ ", InvalidTextRepresentation, "invalid input syntax"),
        ("[,", InvalidTextRepresentation, "invalid input syntax"),
        ("[]", DataException, "at least 1 dimension"),
        ("[ ]", DataException, "at least 1 dimension"),
        ("[1,]", InvalidTextRepresentation, "invalid input syntax"),
        ("[1a]", InvalidTextRepresentation, "invalid input syntax"),
        ("[1,,3]", InvalidTextRepresentation, "invalid input syntax"),
        ("[1, ,3]", InvalidTextRepresentation, "invalid input syntax"),
    ],
)
def test_text_errors(lit, exc, msg):
    with pytest.raises(exc, match=msg):
        Vector.from_text(lit)


def test_typmod():
    # CheckExpectedDim — src/vector.c:83-89
    assert Vector.from_text("[1,2,3]", typmod=3).dim == 3
    with pytest.raises(DataException, match="expected 4 dimensions, not 3"):
        Vector.from_text("[1,2,3]", typmod=4)


def test_max_dim():
    lit = "[" + ",".join(["1"] * 16001) + "]"
    with pytest.raises(ProgramLimitExceeded, match="cannot have more than 16000"):
        Vector.from_text(lit)
    v = Vector(np.ones(16000, np.float32))
    assert v.dim == 16000


def test_nan_inf_constructor():
    with pytest.raises(DataException, match="NaN not allowed"):
        Vector([1.0, float("nan")])
    with pytest.raises(DataException, match="infinite value not allowed"):
        Vector([1.0, float("inf")])


# -- binary I/O (vector_recv/send — src/vector.c:374-423) -----------------
def test_binary_roundtrip():
    v = Vector.from_text("[1.5,-2.25,3e7]")
    w = Vector.from_binary(v.to_binary())
    assert w.to_text() == v.to_text()
    # wire format: big-endian int16 dim, int16 zero, float4 data
    raw = v.to_binary()
    assert raw[:4] == b"\x00\x03\x00\x00"


def test_binary_unused_nonzero():
    with pytest.raises(DataException, match="expected unused to be 0, not 1"):
        Vector.from_binary(b"\x00\x01\x00\x01" + b"\x3f\x80\x00\x00")


# -- distances (test/sql/functions.sql semantics) -------------------------
def test_l2_distance():
    a, b = Vector([0, 0]), Vector([3, 4])
    assert a.l2_distance(b) == 5.0
    assert a.l2_squared_distance(b) == 25.0


def test_inner_product():
    a, b = Vector([1, 2]), Vector([3, 4])
    assert a.inner_product(b) == 11.0
    assert a.negative_inner_product(b) == -11.0  # <#> is negative IP


def test_cosine_distance():
    assert Vector([1, 2]).cosine_distance(Vector([2, 4])) == pytest.approx(0.0, abs=1e-7)
    assert Vector([1, 0]).cosine_distance(Vector([0, 1])) == pytest.approx(1.0)
    assert Vector([1, 1]).cosine_distance(Vector([-1, -1])) == pytest.approx(2.0)
    # zero vector → NaN (division by zero in f64)
    assert math.isnan(Vector([0, 0]).cosine_distance(Vector([1, 1])))


def test_l1_distance():
    assert Vector([0, 0]).l1_distance(Vector([3, 4])) == 7.0


def test_spherical_distance():
    assert Vector([1, 0]).spherical_distance(Vector([0, 1])) == pytest.approx(0.5)
    assert Vector([1, 0]).spherical_distance(Vector([1, 0])) == pytest.approx(0.0)


def test_dim_mismatch():
    with pytest.raises(DataException, match="different vector dimensions 2 and 3"):
        Vector([1, 2]).l2_distance(Vector([1, 2, 3]))


# -- norm / normalize -----------------------------------------------------
def test_norm():
    assert Vector([3, 4]).norm() == 5.0


def test_l2_normalize():
    v = Vector([3, 4]).l2_normalize()
    assert np.allclose(v.x, [0.6, 0.8])
    # zero norm → zero vector (src/vector.c:811-816)
    z = Vector([0, 0]).l2_normalize()
    assert np.all(z.x == 0)


# -- arithmetic (src/vector.c:824-947) ------------------------------------
def test_add_sub_mul():
    a, b = Vector([1, 2, 3]), Vector([4, 5, 6])
    assert (a + b).tolist() == [5, 7, 9]
    assert (b - a).tolist() == [3, 3, 3]
    assert (a * b).tolist() == [4, 10, 18]


def test_add_overflow():
    big = Vector([3e38])
    with pytest.raises(NumericValueOutOfRange, match="overflow"):
        big + big


def test_mul_underflow():
    tiny = Vector([1e-37])
    with pytest.raises(NumericValueOutOfRange, match="underflow"):
        tiny * tiny


def test_concat():
    assert Vector([1, 2]).concat(Vector([3])).to_text() == "[1,2,3]"


def test_binary_quantize():
    assert Vector([1, -1, 0, 2]).binary_quantize().tolist() == [True, False, False, True]


def test_subvector():
    v = Vector([1, 2, 3, 4, 5])
    assert v.subvector(1, 3).to_text() == "[1,2,3]"
    assert v.subvector(3, 2).to_text() == "[3,4]"
    assert v.subvector(-1, 3).to_text() == "[1]"  # clamp like substring
    assert v.subvector(3, 9).to_text() == "[3,4,5]"
    with pytest.raises(DataException):
        v.subvector(1, 0)
    with pytest.raises(DataException):
        v.subvector(9, 1)


# -- ordering (src/vector.c:1030-1143) ------------------------------------
def test_compare():
    assert Vector([1, 2, 3]) < Vector([1, 2, 4])
    assert Vector([1, 2, 3]) == Vector.from_text("[1,2,3]")
    assert Vector([1, 2]) < Vector([1, 2, 0])  # values equal → shorter dim first
    assert Vector([2]) > Vector([1, 9, 9])  # values before dims


# -- aggregates (src/vector.c:1148-1318) ----------------------------------
def test_avg_sum():
    vs = [Vector([1, 2]), Vector([3, 4]), Vector([5, 9])]
    assert avg(vs).to_text() == "[3,5]"
    assert vec_sum(vs).to_text() == "[9,15]"
    assert avg([]) is None
    assert vec_sum([]) is None
    with pytest.raises(DataException, match="expected 2 dimensions, not 3"):
        avg([Vector([1, 2]), Vector([1, 2, 3])])


def test_agg_combine_parallel_safe():
    from pgvector_tpu import VectorAggState

    s1 = VectorAggState()
    s2 = VectorAggState()
    for v in [Vector([1, 2]), Vector([3, 4])]:
        s1.accum(v)
    s2.accum(Vector([5, 9]))
    s1.combine(s2)
    assert s1.avg().to_text() == "[3,5]"


def test_hash_eq_contract_negative_zero():
    """+0.0 and -0.0 vectors compare equal, so they must hash equal."""
    a, b = Vector([0.0, 1.0]), Vector([-0.0, 1.0])
    assert a == b and hash(a) == hash(b)
    assert len({a, b}) == 1


def test_from_binary_truncated_raises_data_exception():
    import struct

    from pgvector_tpu.errors import DataException

    with pytest.raises(DataException):
        Vector.from_binary(b"\x00")
    with pytest.raises(DataException):  # header claims 5 floats, body has 2
        Vector.from_binary(struct.pack(">hh", 5, 0) + b"\x00" * 8)
