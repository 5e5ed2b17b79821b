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


def test_explicit_knob_args_validated():
    """Explicit ef_search/probes arguments honor GUC ranges
    (src/hnsw.c:93-109, src/ivfflat.c:45-56) — they must not bypass the
    clamps SET enforces."""
    import numpy as np
    import pytest

    from pgvector_tpu.errors import InvalidParameterValue
    from pgvector_tpu.index.hnsw import HNSWIndex
    from pgvector_tpu.index.ivfflat import IVFFlatIndex
    from pgvector_tpu.ops.metric import Metric
    from pgvector_tpu.store.table import DenseTable

    rng = np.random.default_rng(0)
    db = rng.normal(size=(64, 8)).astype(np.float32)
    t = DenseTable(8)
    t.insert(db)
    h = HNSWIndex(t, Metric.L2, m=4, ef_construction=16, wave_size=32)
    with pytest.raises(InvalidParameterValue):
        h.search(db[:1], 5, ef_search=10**9)
    with pytest.raises(InvalidParameterValue):
        h.search(db[:1], 5, ef_search=0)
    d, r = h.search(db[:1], 5, ef_search=1000)  # max bound accepted
    assert r[0, 0] >= 0

    iv = IVFFlatIndex(t, Metric.L2, lists=4)
    with pytest.raises(InvalidParameterValue):
        iv.search(db[:1], 5, probes=40000)
    with pytest.raises(InvalidParameterValue):
        iv.search(db[:1], 5, probes=0)
    d, r = iv.search(db[:1], 5, probes=4)
    assert r[0, 0] >= 0
