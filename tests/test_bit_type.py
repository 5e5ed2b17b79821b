"""Type-layer tests for ``bit`` — mirrors test/sql/bit.sql."""

import pytest

from pgvector_tpu import Bit, Vector, DataException


def test_text_roundtrip():
    assert Bit("10110").to_text() == "10110"
    assert Bit.from_text("0").to_text() == "0"


def test_hamming():
    # test/sql/bit.sql: '1100' <~> '1001' = 2
    assert Bit("1100").hamming_distance(Bit("1001")) == 2.0
    assert Bit("1111").hamming_distance(Bit("1111")) == 0.0


def test_jaccard():
    # 1 - |a&b| / |a|b| with empty-intersection → 1 (src/bitutils.c:125-131)
    assert Bit("1100").jaccard_distance(Bit("1001")) == pytest.approx(1 - 1 / 3)
    assert Bit("0000").jaccard_distance(Bit("0000")) == 1.0
    assert Bit("1111").jaccard_distance(Bit("1111")) == 0.0


def test_dim_mismatch():
    with pytest.raises(DataException, match="different bit lengths 4 and 5"):
        Bit("1100").hamming_distance(Bit("10011"))


def test_packing_matches_binary_quantize():
    v = Vector([1, -1, 0.5, 0, 2, -3, 1, 1, 1])
    b = Bit(v.binary_quantize())
    assert b.to_text() == "101010111"
    # MSB-first byte packing like VARBITS
    assert b.to_bytes() == bytes([0b10101011, 0b10000000])
    assert Bit.from_bytes(b.to_bytes(), 9) == b


def test_long_vectors():
    import numpy as np
    rng = np.random.default_rng(7)
    a = rng.random(1000) < 0.5
    b = rng.random(1000) < 0.5
    ba, bb = Bit(a), Bit(b)
    assert ba.hamming_distance(bb) == float(np.sum(a != b))
    ab = np.sum(a & b)
    assert ba.jaccard_distance(bb) == pytest.approx(1 - ab / (a.sum() + b.sum() - ab))
