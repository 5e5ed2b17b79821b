"""Type-layer tests for ``sparsevec`` — mirrors test/sql/sparsevec.sql."""

import numpy as np
import pytest

from pgvector_tpu import (
    SparseVec,
    Vector,
    DataException,
    InvalidTextRepresentation,
    ProgramLimitExceeded,
)


@pytest.mark.parametrize(
    "lit,out",
    [
        ("{1:1.5,3:3.5}/5", "{1:1.5,3:3.5}/5"),
        ("{1:1,2:2,3:3}/3", "{1:1,2:2,3:3}/3"),
        (" { 1 : 1.5 , 3 : 3.5 } / 5 ", "{1:1.5,3:3.5}/5"),
        ("{}/5", "{}/5"),
        ("{3:1,1:2}/5", "{1:2,3:1}/5"),  # sorted on input
        ("{2:0,1:1}/5", "{1:1}/5"),  # zeros dropped
    ],
)
def test_text_roundtrip(lit, out):
    assert SparseVec.from_text(lit).to_text() == out


@pytest.mark.parametrize(
    "lit,exc,msg",
    [
        ("{0:1}/5", DataException, "index out of bounds"),
        ("{6:1}/5", DataException, "index out of bounds"),
        ("{1:1,1:2}/5", DataException, "duplicates"),
        ("{1:NaN}/5", DataException, "NaN not allowed in sparsevec"),
        ("{1:Infinity}/5", DataException, "infinite value not allowed"),
        ("{1:1}/0", DataException, "at least 1 dimension"),
        ("1:1/5", InvalidTextRepresentation, "must start with"),
        ("{1:1}/5x", InvalidTextRepresentation, "Junk after dimensions"),
        ("{1:1}", InvalidTextRepresentation, "invalid input syntax"),
        ("{1:4e38}/5", Exception, "out of range"),
    ],
)
def test_text_errors(lit, exc, msg):
    with pytest.raises(exc, match=msg):
        SparseVec.from_text(lit)


def test_binary_roundtrip():
    v = SparseVec.from_text("{1:1.5,100:-2}/1000")
    w = SparseVec.from_binary(v.to_binary())
    assert w.to_text() == v.to_text()


def test_binary_zero_value_rejected():
    import struct
    data = struct.pack(">iii", 5, 1, 0) + struct.pack(">i", 0) + struct.pack(">f", 0.0)
    with pytest.raises(DataException, match="cannot contain zero values"):
        SparseVec.from_binary(data)


def test_dense_roundtrip():
    v = Vector([0, 1.5, 0, -2, 0])
    s = SparseVec.from_dense(v)
    assert s.to_text() == "{2:1.5,4:-2}/5"
    assert s.to_vector().to_text() == "[0,1.5,0,-2,0]"


def test_distances_match_dense():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a = rng.normal(size=20) * (rng.random(20) < 0.4)
        b = rng.normal(size=20) * (rng.random(20) < 0.4)
        sa, sb = SparseVec.from_dense(a), SparseVec.from_dense(b)
        va, vb = Vector(a.astype(np.float32)), Vector(b.astype(np.float32))
        assert sa.l2_distance(sb) == pytest.approx(va.l2_distance(vb), rel=1e-5)
        assert sa.inner_product(sb) == pytest.approx(va.inner_product(vb), rel=1e-5, abs=1e-6)
        assert sa.l1_distance(sb) == pytest.approx(va.l1_distance(vb), rel=1e-4)
        if np.any(a) and np.any(b):
            assert sa.cosine_distance(sb) == pytest.approx(va.cosine_distance(vb), rel=1e-4)


def test_norm_normalize():
    s = SparseVec.from_text("{1:3,2:4}/5")
    assert s.norm() == 5.0
    assert s.l2_normalize().to_text() == "{1:0.6,2:0.8}/5"


def test_dim_mismatch():
    with pytest.raises(DataException, match="different sparsevec dimensions 5 and 6"):
        SparseVec.from_text("{1:1}/5").l2_distance(SparseVec.from_text("{1:1}/6"))


def test_compare():
    assert SparseVec.from_text("{1:1}/5") < SparseVec.from_text("{1:2}/5")
    assert SparseVec.from_text("{2:1}/5") < SparseVec.from_text("{1:1}/5")  # implicit 0 < 1
    assert SparseVec.from_text("{}/5") < SparseVec.from_text("{}/6")
    assert SparseVec.from_text("{1:1}/5") == SparseVec.from_text("{1:1}/5")
    assert SparseVec.from_text("{1:-1}/5") < SparseVec.from_text("{}/5")


def test_max_nnz():
    idx = np.arange(16001, dtype=np.int32)
    val = np.ones(16001, dtype=np.float32)
    with pytest.raises(ProgramLimitExceeded, match="more than 16000 non-zero"):
        SparseVec(100000, idx, val)
