"""GUC registry tests — ranges, enums, scoped overrides (SET LOCAL), and
unknown-parameter errors (src/hnsw.c:81-112, src/ivfflat.c:38-59)."""

import pytest

from pgvector_tpu import config
from pgvector_tpu.errors import InvalidParameterValue


def test_defaults():
    assert config.get("hnsw.ef_search") == 40
    assert config.get("ivfflat.probes") == 1
    assert config.get("hnsw.iterative_scan") == "off"


def test_set_and_reset():
    config.set("hnsw.ef_search", 100)
    assert config.get("hnsw.ef_search") == 100
    config.reset("hnsw.ef_search")
    assert config.get("hnsw.ef_search") == 40


def test_range_validation():
    with pytest.raises(InvalidParameterValue, match="outside the valid range"):
        config.set("hnsw.ef_search", 0)
    with pytest.raises(InvalidParameterValue, match="outside the valid range"):
        config.set("hnsw.ef_search", 1001)


def test_enum_validation():
    with pytest.raises(InvalidParameterValue, match="invalid value"):
        config.set("hnsw.iterative_scan", "sometimes")


def test_unknown_parameter():
    with pytest.raises(InvalidParameterValue, match="unrecognized configuration parameter"):
        config.set("hnsw.nope", 1)
    with pytest.raises(InvalidParameterValue, match="unrecognized configuration parameter"):
        config.get("nope.nope")


def test_local_scoping():
    assert config.get("ivfflat.probes") == 1
    with config.local(**{"ivfflat.probes": 7}):
        assert config.get("ivfflat.probes") == 7
        with config.local(**{"ivfflat.probes": 9}):
            assert config.get("ivfflat.probes") == 9
        assert config.get("ivfflat.probes") == 7
    assert config.get("ivfflat.probes") == 1


def test_local_validates():
    with pytest.raises(InvalidParameterValue):
        with config.local(**{"ivfflat.probes": 0}):
            pass


def test_describe():
    d = config.describe()
    assert "hnsw.ef_search" in d and d["hnsw.ef_search"]["default"] == 40
