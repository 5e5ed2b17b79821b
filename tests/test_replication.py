"""Incremental replication tests — the test/t/001_wal.pl methodology:
after every insert/delete/vacuum cycle shipped as DELTAS (not full
snapshots), the same KNN query must return the same result on primary and
replica.  Here the guarantee is stronger than the reference's: replay is
bit-deterministic (checkpoints carry the level-rng state), so the graphs
are identical, not merely equivalent."""

import numpy as np
import pytest

from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.index.ivfflat import IVFFlatIndex
from pgvector_tpu.io import (ReplicationLog, apply_deltas, load_hnsw,
                             load_ivfflat, load_table, save_hnsw,
                             save_ivfflat, save_table)
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import DenseTable


@pytest.fixture()
def primary():
    rng = np.random.default_rng(31)
    db = rng.normal(size=(1500, 10)).astype(np.float32)
    table = DenseTable(10)
    table.insert(db[:800])
    idx = HNSWIndex(table, Metric.L2, m=8, ef_construction=32,
                    wave_size=128, beam_expand=4, seed=5)
    return db, table, idx


def test_delta_replication_hnsw(primary, tmp_path):
    db, table, idx = primary
    q = db[:10] + 0.01
    # base checkpoint = the replica bootstrap (cold state transfer)
    save_table(table, str(tmp_path / "base_table"))
    save_hnsw(idx, str(tmp_path / "base_idx"))
    r_table = load_table(str(tmp_path / "base_table"))
    r_idx = load_hnsw(r_table, str(tmp_path / "base_idx"))

    log = ReplicationLog(str(tmp_path / "log"))
    applied = 0
    for lo, hi, dele in ((800, 1100, (0, 100)), (1100, 1500, (100, 180))):
        # primary: insert → delete → vacuum, logging each op
        rows = table.insert(db[lo:hi])
        idx.insert(rows)
        log.log_insert(table, rows)
        dead = np.arange(*dele)
        table.delete(dead)
        log.log_delete(dead)
        idx.vacuum()
        log.log_vacuum()
        # replica: catch up incrementally from the last applied seq
        applied = apply_deltas(r_table, [r_idx], str(tmp_path / "log"),
                               start_seq=applied)
        # same query, same result — on both nodes (test/t/001:16-44)
        d_p, r_p = idx.search(q, 10, ef_search=60)
        d_r, r_r = r_idx.search(q, 10, ef_search=60)
        assert np.array_equal(r_p, r_r)
        assert np.allclose(d_p, d_r, equal_nan=True)
    # replay determinism is exact: graph arrays are bit-identical
    assert np.array_equal(np.asarray(idx.nbr0), np.asarray(r_idx.nbr0))
    assert np.array_equal(idx.levels, r_idx.levels)
    assert idx.entry == r_idx.entry
    # and the replica agrees with exact search like the primary does
    _, e_i = FlatIndex(r_table, Metric.L2).search(q, 10)
    hits = sum(len(set(map(int, a)) & set(map(int, e)))
               for a, e in zip(r_r, e_i))
    assert hits / (10 * len(q)) >= 0.9


def test_delta_replication_ivf(tmp_path):
    rng = np.random.default_rng(32)
    db = rng.normal(size=(1200, 8)).astype(np.float32)
    table = DenseTable(8)
    table.insert(db[:900])
    idx = IVFFlatIndex(table, Metric.L2, lists=12, seed=3)
    save_table(table, str(tmp_path / "bt"))
    save_ivfflat(idx, str(tmp_path / "bi"))
    r_table = load_table(str(tmp_path / "bt"))
    r_idx = load_ivfflat(r_table, str(tmp_path / "bi"))
    log = ReplicationLog(str(tmp_path / "log"))
    rows = table.insert(db[900:])
    idx.insert(rows)
    log.log_insert(table, rows)
    table.delete(np.arange(50))
    log.log_delete(np.arange(50))
    idx.vacuum()
    log.log_vacuum()
    applied = apply_deltas(r_table, [r_idx], str(tmp_path / "log"))
    q = db[:8] + 0.01
    d_p, r_p = idx.search(q, 10, probes=12)
    d_r, r_r = r_idx.search(q, 10, probes=12)
    assert np.array_equal(r_p, r_r)
    assert np.allclose(d_p, d_r, equal_nan=True)
    # incremental catch-up: nothing new → no-op, same seq
    assert apply_deltas(r_table, [r_idx], str(tmp_path / "log"),
                        start_seq=applied) == applied


def test_divergent_replica_rejected(tmp_path):
    rng = np.random.default_rng(33)
    db = rng.normal(size=(100, 4)).astype(np.float32)
    table = DenseTable(4)
    table.insert(db[:50])
    log = ReplicationLog(str(tmp_path / "log"))
    rows = table.insert(db[50:])
    log.log_insert(table, rows)
    # replica that did NOT start from the base: extra row shifts ids
    bad = DenseTable(4)
    bad.insert(db[:51])
    from pgvector_tpu.errors import DataException

    with pytest.raises(DataException):
        apply_deltas(bad, [], str(tmp_path / "log"))


def test_bf16_delta_roundtrip(tmp_path, rng):
    """bfloat16 row values survive the delta log bit-exactly (np.save
    would otherwise write them as opaque |V2 and break replay)."""
    import jax.numpy as jnp
    from pgvector_tpu.store.table import DenseTable

    prim = DenseTable(8, dtype=jnp.bfloat16)
    repl = DenseTable(8, dtype=jnp.bfloat16)
    log = ReplicationLog(str(tmp_path / "log"))
    rows = prim.insert(rng.normal(size=(32, 8)).astype(np.float32))
    log.log_insert(prim, rows)
    apply_deltas(repl, [], str(tmp_path / "log"))
    np.testing.assert_array_equal(
        np.asarray(prim.data[:32]).astype(np.float32),
        np.asarray(repl.data[:32]).astype(np.float32),
    )


def test_relation_wires_replication_log(tmp_path, rng):
    """The documented primary-side wiring: rel.replication_log = log makes
    insert/delete/vacuum append delta records a replica can replay."""
    from pgvector_tpu.relation import Relation

    db = rng.normal(size=(300, 6)).astype(np.float32)
    rel = Relation(DenseTable(6))
    base_rows = rel.insert(db[:200])
    # replica bootstraps from the base
    save_table(rel.table, str(tmp_path / "base"))
    r_table = load_table(str(tmp_path / "base"))
    rel.replication_log = ReplicationLog(str(tmp_path / "log"))
    rel.insert(db[200:])
    rel.delete(base_rows[:20])
    rel.vacuum()
    apply_deltas(r_table, [], str(tmp_path / "log"))
    np.testing.assert_array_equal(np.asarray(rel.table.valid[:300]),
                                  np.asarray(r_table.valid[:300]))
    np.testing.assert_array_equal(np.asarray(rel.table.data[:300]),
                                  np.asarray(r_table.data[:300]))


def test_apply_deltas_rejects_gaps_and_log_resumes_past_gaps(tmp_path, rng):
    """A missing delta must fail replay loudly (silent skip = divergent
    replica that looks caught up), and a re-opened log must never re-issue
    a sequence number that already exists past a gap."""
    import shutil

    from pgvector_tpu.errors import DataException

    t = DenseTable(4)
    log = ReplicationLog(str(tmp_path / "log"))
    for j in range(3):
        rows = t.insert(rng.normal(size=(4, 4)).astype(np.float32))
        log.log_insert(t, rows)
    shutil.rmtree(str(tmp_path / "log" / "delta_00000001"))
    replica = DenseTable(4)
    with pytest.raises(DataException, match="gap"):
        apply_deltas(replica, [], str(tmp_path / "log"))
    # seq resumes from max+1, not the entry count (which would collide)
    log2 = ReplicationLog(str(tmp_path / "log"))
    assert log2.seq == 3


def test_crashed_append_is_invisible_and_recoverable(tmp_path, monkeypatch):
    """A kill mid-append leaves only a delta_NNN.tmp staging dir: replicas
    never see it, the log re-opens at the right seq, and the retried append
    lands cleanly (the GenericXLog all-or-nothing record analogue)."""
    import os as _os

    rng = np.random.default_rng(33)
    db = rng.normal(size=(60, 6)).astype(np.float32)
    table = DenseTable(6)
    rows0 = table.insert(db[:30])
    log = ReplicationLog(str(tmp_path / "log"))
    log.log_insert(table, rows0)

    rows1 = table.insert(db[30:])
    real_save = np.save
    monkeypatch.setattr(np, "save",
                        lambda *a, **k: (_ for _ in ()).throw(KeyboardInterrupt))
    with pytest.raises(KeyboardInterrupt):
        log.log_insert(table, rows1)
    monkeypatch.setattr(np, "save", real_save)
    # the torn record is staged, not committed
    names = sorted(_os.listdir(tmp_path / "log"))
    assert "delta_00000001.tmp" in names and "delta_00000001" not in names
    # replicas replay only committed records
    r_table = DenseTable(6)
    assert apply_deltas(r_table, [], str(tmp_path / "log")) == 1
    assert r_table.live_count == 30
    # a re-opened log resumes at the torn seq and the retry overwrites the
    # stale staging dir
    log2 = ReplicationLog(str(tmp_path / "log"))
    assert log2.seq == 1
    log2.log_insert(table, rows1)
    assert apply_deltas(r_table, [], str(tmp_path / "log"), start_seq=1) == 2
    assert r_table.live_count == 60


def test_prune_up_to_checkpoint_base(tmp_path):
    """Delta-log pruning: records already baked into a checkpoint base are
    dropped; replicas bootstrapped from that base replay the tail, while a
    stale replica hits the gap check instead of silently diverging."""
    rng = np.random.default_rng(34)
    db = rng.normal(size=(90, 6)).astype(np.float32)
    table = DenseTable(6)
    log = ReplicationLog(str(tmp_path / "log"))
    for lo in (0, 30, 60):
        rows = table.insert(db[lo:lo + 30])
        log.log_insert(table, rows)
    # checkpoint after the second record; prune everything it contains
    # (the base-seq handshake: snapshot log.seq at save time)
    chk_table = DenseTable(6)
    base_seq = apply_deltas(chk_table, [], str(tmp_path / "log"))
    assert base_seq == 3
    save_table(chk_table, str(tmp_path / "base"))
    rows = table.insert(rng.normal(size=(10, 6)).astype(np.float32))
    log.log_insert(table, rows)  # seq 3, after the base
    assert log.prune(base_seq) == 3
    # fresh replica from the base catches up from the pruned tail
    r = load_table(str(tmp_path / "base"))
    assert apply_deltas(r, [], str(tmp_path / "log"), start_seq=base_seq) == 4
    assert r.live_count == 100
    # a stale replica (start_seq=0) is rejected, not silently diverged
    from pgvector_tpu.errors import DataException

    with pytest.raises(DataException, match="gap"):
        apply_deltas(DenseTable(6), [], str(tmp_path / "log"), start_seq=0)
