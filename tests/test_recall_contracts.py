"""Per-type HNSW recall/maintenance contracts — the analogues of the
reference's TAP matrix over value types:

- insert-path recall (test/t/013, 021, 025, 029): an index populated
  entirely through aminsert (never a bulk build) must hit the same
  recall floors as a built one.
- vacuum recall (test/t/014, 022, 026, 030): delete half, vacuum (the
  4-pass repair), re-insert fresh rows — recall must hold on the
  repaired graph.
- duplicates (test/t/015, 023, 027, 031): duplicate values merge into
  one graph element (≤10 TID multiplexing, hnsw.h:69) for every type,
  including values that only become equal after 16-bit rounding.

Floors are set for these sizes (1.2-1.8k rows, 16-64 dims) where a
healthy graph scores ≥0.95 dense / ≥0.85 bit+sparse (ties and
low-contrast metrics run looser, as in the reference's own floors).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import BitTable, DenseTable, SparseTable
from pgvector_tpu.types import SparseVec


def _recall(got: np.ndarray, exact: np.ndarray) -> float:
    hits = sum(len(set(map(int, a[a >= 0])) & set(map(int, b[b >= 0])))
               for a, b in zip(got, exact))
    denom = sum(int((b >= 0).sum()) for b in exact)
    return hits / max(denom, 1)


def _dense_case(dtype):
    rng = np.random.default_rng(21)
    db = rng.normal(size=(1200, 16)).astype(np.float32)
    table = DenseTable(16, dtype=dtype)
    qs = (db[:16] + 0.01).astype(np.float32)
    return table, db, qs, Metric.L2, 0.95


def _bit_case():
    rng = np.random.default_rng(22)
    db = rng.random((1200, 64)) > 0.5
    table = BitTable(64)
    qs = db[:16]
    return table, db, qs, Metric.HAMMING, 0.85


def _sparse_case():
    rng = np.random.default_rng(23)
    dense = (rng.normal(size=(1200, 48))
             * (rng.random((1200, 48)) < 0.3)).astype(np.float32)
    dense[dense.sum(axis=1) == 0, 0] = 1.0
    db = [SparseVec.from_dense(r) for r in dense]
    table = SparseTable(48, nnz_cap=40)
    qs = db[:16]
    return table, db, qs, Metric.IP, 0.85


CASES = {
    "vector": lambda: _dense_case(jnp.float32),
    "halfvec": lambda: _dense_case(jnp.bfloat16),
    "bit": _bit_case,
    "sparsevec": _sparse_case,
}


@pytest.mark.parametrize("kind", list(CASES))
def test_insert_path_recall(kind):
    """test/t/013/021/025/029: insert-only population hits the floor."""
    table, db, qs, metric, floor = CASES[kind]()
    idx = HNSWIndex(table, metric, m=8, ef_construction=32, wave_size=256,
                    build=False, seed=31)
    for s in range(0, len(db), 300):
        rows = table.insert(db[s: s + 300])
        idx.insert(rows)
    _, exact = FlatIndex(table, metric).search(qs, 10)
    _, got = idx.search(qs, 10, ef_search=80)
    assert _recall(got, exact) >= floor


@pytest.mark.parametrize("kind", list(CASES))
def test_vacuum_recall(kind):
    """test/t/014/022/026/030: recall holds on the repaired graph after
    delete-half → vacuum → re-insert."""
    table, db, qs, metric, floor = CASES[kind]()
    n = len(db)
    rows = table.insert(db)
    idx = HNSWIndex(table, metric, m=8, ef_construction=32, wave_size=256,
                    seed=33)
    kill = np.asarray(rows)[1::2][: n // 2]  # odd rows (keeps the queries)
    table.delete(kill)
    idx.vacuum()
    re_rows = table.insert(db[1::2][: n // 2] if kind != "sparsevec"
                           else [db[i] for i in range(1, n, 2)][: n // 2])
    idx.insert(re_rows)
    _, exact = FlatIndex(table, metric).search(qs, 10)
    _, got = idx.search(qs, 10, ef_search=80)
    assert _recall(got, exact) >= floor


def test_bit_duplicates_merge():
    """test/t/023: duplicate bit patterns share one graph element and
    searches surface every duplicate row."""
    rng = np.random.default_rng(24)
    base = rng.random((60, 64)) > 0.5
    db = np.concatenate([base, base[:5], base[:5]])
    table = BitTable(64)
    table.insert(db)
    idx = HNSWIndex(table, Metric.HAMMING, m=8, ef_construction=32,
                    wave_size=64)
    assert idx.live_elements == 60
    _, r = idx.search(base[0][None, :], 3, ef_search=60)
    assert set(map(int, r[0])) == {0, 60, 65}


def test_sparse_duplicates_merge():
    """test/t/031: duplicate sparse values merge."""
    svs = [SparseVec.from_dense(v) for v in np.eye(12, dtype=np.float32)]
    db = svs + svs[:3] + svs[:3]
    table = SparseTable(12, nnz_cap=4)
    table.insert(db)
    idx = HNSWIndex(table, Metric.L2, m=4, ef_construction=16, wave_size=32)
    assert idx.live_elements == 12
    _, r = idx.search([svs[1]], 3, ef_search=24)
    assert set(map(int, r[0])) == {1, 13, 16}


def test_halfvec_rounding_creates_duplicates():
    """test/t/027 nuance: two f32 values distinct at full precision but
    equal after the table's 16-bit rounding are duplicates OF EACH OTHER
    (the reference dedups on the stored halfvec datum, not the input)."""
    rng = np.random.default_rng(25)
    base = rng.normal(size=(40, 8)).astype(np.float32)
    twin = base[0] * (1 + 1e-6)  # within bf16 rounding of base[0]
    table = DenseTable(8, dtype=jnp.bfloat16)
    table.insert(np.vstack([base, twin]))
    assert np.array_equal(np.asarray(table.data[0]),
                          np.asarray(table.data[40]))
    idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32, wave_size=64)
    assert idx.live_elements == 40
    _, r = idx.search(base[0][None, :], 2, ef_search=40)
    assert set(map(int, r[0])) == {0, 40}
