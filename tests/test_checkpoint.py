"""Checkpoint round-trip tests — the replica-consistency methodology of
test/t/001 applied to serialization: save, load into a fresh process-state,
run the same query, assert identical results."""

import numpy as np
import pytest

from pgvector_tpu.errors import DataException
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.index.ivfflat import IVFFlatIndex
from pgvector_tpu.io import (
    load_hnsw,
    load_ivfflat,
    load_table,
    save_hnsw,
    save_ivfflat,
    save_table,
)
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import BitTable, DenseTable, SparseTable
from pgvector_tpu.types import SparseVec


def test_dense_table_roundtrip(tmp_path, rng):
    db = rng.normal(size=(100, 8)).astype(np.float32)
    t = DenseTable(8)
    t.insert(db)
    t.delete([4, 7])
    save_table(t, str(tmp_path / "t"))
    t2 = load_table(str(tmp_path / "t"))
    q = db[:3]
    d1, i1 = FlatIndex(t, Metric.L2).search(q, 5)
    d2, i2 = FlatIndex(t2, Metric.L2).search(q, 5)
    assert np.allclose(d1, d2) and (i1 == i2).all()


def test_bit_table_roundtrip(tmp_path, rng):
    db = rng.random((50, 40)) < 0.5
    t = BitTable(40)
    t.insert(db)
    save_table(t, str(tmp_path / "b"))
    t2 = load_table(str(tmp_path / "b"))
    d1, i1 = FlatIndex(t, Metric.HAMMING).search(db[:2], 5)
    d2, i2 = FlatIndex(t2, Metric.HAMMING).search(db[:2], 5)
    assert np.allclose(d1, d2)


def test_sparse_table_roundtrip(tmp_path, rng):
    dense = (rng.normal(size=(60, 30)) * (rng.random((60, 30)) < 0.3)).astype(np.float32)
    dense[dense.sum(1) == 0, 0] = 1
    t = SparseTable(30, nnz_cap=16)
    t.insert([SparseVec.from_dense(r) for r in dense])
    save_table(t, str(tmp_path / "s"))
    t2 = load_table(str(tmp_path / "s"))
    q = [SparseVec.from_dense(dense[0])]
    d1, i1 = FlatIndex(t, Metric.L2).search(q, 5)
    d2, i2 = FlatIndex(t2, Metric.L2).search(q, 5)
    assert np.allclose(d1, d2) and (i1 == i2).all()


def test_hnsw_roundtrip(tmp_path, rng):
    db = rng.normal(size=(300, 8)).astype(np.float32)
    t = DenseTable(8)
    t.insert(db)
    idx = HNSWIndex(t, Metric.L2, m=8, ef_construction=32, wave_size=64)
    save_hnsw(idx, str(tmp_path / "h"))
    idx2 = load_hnsw(t, str(tmp_path / "h"))
    q = rng.normal(size=(5, 8)).astype(np.float32)
    d1, r1 = idx.search(q, 5, ef_search=40)
    d2, r2 = idx2.search(q, 5, ef_search=40)
    assert np.allclose(d1, d2) and (r1 == r2).all()
    # loaded index accepts inserts
    rows = t.insert(rng.normal(size=(10, 8)).astype(np.float32))
    idx2.insert(rows)
    assert idx2.live_elements == 310


def test_ivfflat_roundtrip(tmp_path, rng):
    db = rng.normal(size=(500, 8)).astype(np.float32)
    t = DenseTable(8)
    t.insert(db)
    idx = IVFFlatIndex(t, Metric.L2, lists=8, seed=1)
    save_ivfflat(idx, str(tmp_path / "i"))
    idx2 = load_ivfflat(t, str(tmp_path / "i"))
    q = rng.normal(size=(5, 8)).astype(np.float32)
    d1, r1 = idx.search(q, 5, probes=4)
    d2, r2 = idx2.search(q, 5, probes=4)
    assert np.allclose(d1, d2) and (r1 == r2).all()


def test_bad_magic(tmp_path):
    import json

    p = tmp_path / "bad"
    p.mkdir()
    (p / "manifest.json").write_text(json.dumps({"magic": "nope", "version": 1}))
    with pytest.raises(DataException, match="bad magic"):
        load_table(str(p))


def test_bf16_table_and_index_roundtrip(tmp_path, rng):
    """bfloat16 arrays survive save/load bit-exactly.  np.save writes
    ml_dtypes bfloat16 as raw void ("|V2"); the codec stores the bit
    pattern as uint16 under a tagged filename instead."""
    import jax.numpy as jnp

    db = rng.normal(size=(200, 16)).astype(np.float32)
    t = DenseTable(16, dtype=jnp.bfloat16)
    t.insert(db)
    save_table(t, str(tmp_path / "t"))
    t2 = load_table(str(tmp_path / "t"))
    assert t2.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(t.data[:200]).astype(np.float32),
        np.asarray(t2.data[:200]).astype(np.float32),
    )

    idx = HNSWIndex(t, Metric.L2, m=4, ef_construction=16, seed=0)
    # a 16-bit table's index stores 16-bit values (halfvec parity)
    assert idx.values[0].dtype == jnp.bfloat16
    save_hnsw(idx, str(tmp_path / "i"))
    idx2 = load_hnsw(t2, str(tmp_path / "i"))
    assert idx2.values[0].dtype == jnp.bfloat16
    q = rng.normal(size=(4, 16)).astype(np.float32)
    d1, r1 = idx.search(q, 5)
    d2, r2 = idx2.search(q, 5)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_resave_dtype_switch_removes_stale_variant(tmp_path, rng):
    """Re-saving a different-dtype table into the same directory must not
    leave the previous dtype's file behind: _load prefers the .bf16.npy
    tagged variant, so a stale one would silently shadow fresh f32 data."""
    import jax.numpy as jnp

    p = str(tmp_path / "t")
    tb = DenseTable(8, dtype=jnp.bfloat16)
    tb.insert(np.ones((4, 8), np.float32))
    save_table(tb, p)
    tf = DenseTable(8)
    tf.insert(np.full((4, 8), 2.0, np.float32))
    save_table(tf, p)
    got = load_table(p)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got.data[:4]), 2.0)
    # and the reverse direction: f32 -> bf16 re-save drops the plain file
    save_table(tb, p)
    got2 = load_table(p)
    assert got2.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got2.data[:4]).astype(np.float32), 1.0)


# ---------------------------------------------------------------------------
# crash atomicity — the GenericXLog-equivalence story (every reference page
# mutation is WAL'd so a crash recovers to a consistent image,
# src/hnswinsert.c:695-743).  Saves commit by atomically replacing the
# manifest AFTER all epoch-tagged array files are fsynced; a kill at any
# point must load as either the old state or the new one, never a mix.
# ---------------------------------------------------------------------------


def _make_table(value: float) -> DenseTable:
    t = DenseTable(8)
    t.insert(np.full((4, 8), value, np.float32))
    return t


def test_crash_during_array_write_keeps_old_state(tmp_path, monkeypatch):
    p = str(tmp_path / "t")
    save_table(_make_table(1.0), p)
    calls = {"n": 0}
    real_save = np.save

    def dying_save(f, a, *args, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:  # die midway through the new epoch's arrays
            raise KeyboardInterrupt("simulated kill -9")
        return real_save(f, a, *args, **kw)

    monkeypatch.setattr(np, "save", dying_save)
    with pytest.raises(KeyboardInterrupt):
        save_table(_make_table(2.0), p)
    monkeypatch.undo()
    got = load_table(p)  # old epoch still committed
    np.testing.assert_allclose(np.asarray(got.data[:4]), 1.0)
    # and a post-crash save skips past the orphaned epoch and commits clean
    save_table(_make_table(3.0), p)
    np.testing.assert_allclose(np.asarray(load_table(p).data[:4]), 3.0)


def test_crash_before_manifest_commit_keeps_old_state(tmp_path, monkeypatch):
    import os as _os

    p = str(tmp_path / "t")
    save_table(_make_table(1.0), p)

    def no_replace(src, dst):
        raise KeyboardInterrupt("simulated kill between fsync and commit")

    monkeypatch.setattr(_os, "replace", no_replace)
    with pytest.raises(KeyboardInterrupt):
        save_table(_make_table(2.0), p)
    monkeypatch.undo()
    np.testing.assert_allclose(np.asarray(load_table(p).data[:4]), 1.0)


def test_crash_during_first_save_is_a_clear_error(tmp_path, monkeypatch):
    p = str(tmp_path / "t")
    monkeypatch.setattr(np, "save",
                        lambda *a, **k: (_ for _ in ()).throw(KeyboardInterrupt))
    with pytest.raises(KeyboardInterrupt):
        save_table(_make_table(1.0), p)
    monkeypatch.undo()
    with pytest.raises(DataException, match="no manifest"):
        load_table(p)


def test_committed_save_survives_gc_crash(tmp_path, monkeypatch):
    """A kill after the manifest replace but before old-epoch GC leaves
    orphans that loads ignore and the next save cleans up."""
    import os as _os

    p = str(tmp_path / "t")
    save_table(_make_table(1.0), p)
    monkeypatch.setattr(_os, "remove",
                        lambda *a: (_ for _ in ()).throw(KeyboardInterrupt))
    try:
        save_table(_make_table(2.0), p)  # GC failure must not lose the commit
    except KeyboardInterrupt:
        pass
    monkeypatch.undo()
    np.testing.assert_allclose(np.asarray(load_table(p).data[:4]), 2.0)
    save_table(_make_table(3.0), p)
    np.testing.assert_allclose(np.asarray(load_table(p).data[:4]), 3.0)
    # the orphaned epoch-1 files are gone after the clean save
    import re as _re

    leftover = [f for f in _os.listdir(p)
                if f.endswith(".npy") and not _re.search(r"\.3(\.bf16)?\.npy$", f)]
    assert leftover == []


def test_hnsw_crash_during_resave_keeps_old_graph(tmp_path, rng, monkeypatch):
    db = rng.normal(size=(300, 8)).astype(np.float32)
    t = DenseTable(8)
    t.insert(db)
    idx = HNSWIndex(t, Metric.L2, m=8, ef_construction=32, wave_size=64)
    p = str(tmp_path / "h")
    save_hnsw(idx, p)
    q = rng.normal(size=(5, 8)).astype(np.float32)
    d_before, r_before = idx.search(q, 5, ef_search=40)
    # mutate the index, then die mid-resave
    rows = t.insert(rng.normal(size=(20, 8)).astype(np.float32))
    idx.insert(rows)
    calls = {"n": 0}
    real_save = np.save

    def dying_save(f, a, *args, **kw):
        calls["n"] += 1
        if calls["n"] >= 4:
            raise KeyboardInterrupt
        return real_save(f, a, *args, **kw)

    monkeypatch.setattr(np, "save", dying_save)
    with pytest.raises(KeyboardInterrupt):
        save_hnsw(idx, p)
    monkeypatch.undo()
    idx2 = load_hnsw(t, p)
    assert idx2.live_elements == 300  # pre-crash graph, intact
    d2, r2 = idx2.search(q, 5, ef_search=40)
    assert np.allclose(d_before, d2) and (np.asarray(r_before) == np.asarray(r2)).all()


def test_round4_checkpoint_upgrades_to_current_code():
    """Forward-migration contract (VERDICT r4 #10, the ALTER EXTENSION
    vector UPDATE analogue — reference ships 42 migration scripts,
    sql/vector--X--Y.sql): a checkpoint written by the FROZEN round-4 code
    (tests/fixtures/ckpt_r4, generated from commit 7afe66c — its manifest
    predates the nbr_up_width field) must load under current code and
    reproduce the exact search results recorded at save time."""
    import os

    from pgvector_tpu.io.checkpoint import load_hnsw, load_table

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "ckpt_r4")
    exp = np.load(os.path.join(fix, "expected.npz"))
    table = load_table(os.path.join(fix, "table"))
    np.testing.assert_array_equal(np.asarray(table.data[:300]), exp["db"])
    idx = load_hnsw(table, os.path.join(fix, "hnsw"))
    assert idx.live_elements == 300
    # restored value arrays are index-capacity-sized and index-private
    assert idx.values[0].shape[0] == idx.cap_e and not idx._alias_values
    d, r = idx.search(exp["q"], 5, ef_search=32)
    np.testing.assert_array_equal(np.asarray(r), exp["r"])
    np.testing.assert_allclose(np.asarray(d), exp["d"], rtol=0, atol=0)
    # the index stays writable after the upgrade
    rows = table.insert(exp["db"][:10] + 3.0)
    idx.insert(rows)
    d2, r2 = idx.search(exp["db"][:2] + 3.0, 3, ef_search=32)
    assert np.asarray(r2).shape == (2, 3)
