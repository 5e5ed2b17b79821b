"""Checkpoint / persistence — the crash-safety analogue of the reference's
WAL'd index pages (SURVEY.md §5 "Checkpoint / resume": the index *is* the
checkpoint, fully materialized pages with magic/version metapages,
hnsw.h:41-43, ivfflat.h:46-48).

A checkpoint is a directory:

    manifest.json     — magic, format version, epoch, object kind + params
    *.<epoch>.npy     — one file per array (host-side numpy save)

Saves are **crash-atomic** (the analogue of the reference's GenericXLog
crash safety — every reference page mutation is WAL'd, e.g.
src/hnswinsert.c:695-743, so a crash always recovers to a consistent
image).  Here the commit protocol is: write all array files under a fresh
epoch tag and fsync them, then atomically replace ``manifest.json``
(tmp + fsync + ``os.replace``) pointing at that epoch, then fsync the
directory and garbage-collect older epochs.  A crash at ANY point leaves
either the previous epoch (manifest untouched, new files are ignored
orphans) or the new one (manifest committed) — never a mix.

Tables and both index AMs round-trip losslessly; version numbers gate
future format migrations the way ``ALTER EXTENSION vector UPDATE`` walks
the 42 SQL migration scripts (README.md:1272-1284).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..errors import DataException
from ..ops.metric import Metric
from ..store.table import BitTable, DenseTable, SparseTable

MAGIC = "pgvector-tpu"
FORMAT_VERSION = 1

# array files: <name>.<epoch>.npy / <name>.<epoch>.bf16.npy; legacy
# (pre-round-4, non-atomic) checkpoints used <name>.npy with no epoch
_ARRAY_RE = re.compile(r"^(?P<name>.+?)(?:\.(?P<epoch>\d+))?(?P<tag>\.bf16)?\.npy$")


def _fsync_file(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_dir(path: str) -> None:
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:  # platforms that cannot open directories
        return
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _begin_save(path: str) -> int:
    """Open a save transaction: ensure the dir exists and pick the next
    epoch — one past anything visible in the manifest OR on disk, so a
    crashed save's orphan files are never overwritten mid-flight."""
    os.makedirs(path, exist_ok=True)
    epoch = 0
    try:
        with open(os.path.join(path, "manifest.json")) as f:
            epoch = int(json.load(f).get("epoch", 0))
    except (OSError, ValueError):
        pass
    for fn in os.listdir(path):
        m = _ARRAY_RE.match(fn)
        if m and m.group("epoch"):
            epoch = max(epoch, int(m.group("epoch")))
    return epoch + 1


def _write_manifest(path: str, payload: Dict[str, Any], epoch: int) -> None:
    """Commit point: atomically publish the manifest for ``epoch`` (array
    files already fsynced), then GC every other epoch's array files."""
    payload = dict(payload)
    payload["magic"] = MAGIC
    payload["version"] = FORMAT_VERSION
    payload["epoch"] = epoch
    final = os.path.join(path, "manifest.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)
    _fsync_dir(path)
    # GC is best-effort: a crash here leaves ignorable orphans, never
    # corruption (the committed manifest names its epoch explicitly)
    for fn in os.listdir(path):
        m = _ARRAY_RE.match(fn)
        if m and (m.group("epoch") or "0") != str(epoch):
            try:
                os.remove(os.path.join(path, fn))
            except OSError:
                pass


def _read_manifest(path: str) -> Dict[str, Any]:
    try:
        with open(os.path.join(path, "manifest.json")) as f:
            m = json.load(f)
    except FileNotFoundError:
        raise DataException(
            f"invalid checkpoint at {path!r}: no manifest "
            "(interrupted first save, or not a checkpoint directory)")
    except ValueError:
        raise DataException(f"invalid checkpoint at {path!r}: corrupt manifest")
    if m.get("magic") != MAGIC:
        raise DataException("invalid checkpoint: bad magic")
    if m.get("version") != FORMAT_VERSION:
        raise DataException(
            f"unsupported checkpoint version {m.get('version')}"
        )
    return m


def _array_name(name: str, epoch: Optional[int], tagged: bool) -> str:
    tag = ".bf16" if tagged else ""
    if epoch:
        return f"{name}.{epoch}{tag}.npy"
    return f"{name}{tag}.npy"  # legacy non-epoch layout


def _save_arrays(path: str, arrays: Dict[str, Any], epoch: int = 0) -> None:
    for name, arr in arrays.items():
        a = np.asarray(arr)
        if a.dtype == np.dtype(jnp.bfloat16):
            # np.save writes ml_dtypes bfloat16 as raw void ("|V2"), which
            # np.load cannot reinterpret — store the bit pattern as uint16
            # under a tagged name instead
            fn = os.path.join(path, _array_name(name, epoch, True))
            np.save(fn, np.ascontiguousarray(a).view(np.uint16))
        else:
            fn = os.path.join(path, _array_name(name, epoch, False))
            np.save(fn, a)
        _fsync_file(fn)


def _load(path: str, name: str, epoch: int = 0) -> np.ndarray:
    tagged = os.path.join(path, _array_name(name, epoch, True))
    if os.path.exists(tagged):
        return np.load(tagged).view(np.dtype(jnp.bfloat16))
    return np.load(os.path.join(path, _array_name(name, epoch, False)))


# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------


def save_table(table, path: str) -> None:
    epoch = _begin_save(path)
    if isinstance(table, DenseTable):
        kind = "dense"
        arrays = {"data": table.data[: table.count]}
        extra = {"dim": table.dim, "dtype": str(np.dtype(jnp.dtype(table.dtype)))}
    elif isinstance(table, BitTable):
        kind = "bit"
        arrays = {"data": table.data[: table.count]}
        extra = {"dim": table.dim}
    elif isinstance(table, SparseTable):
        kind = "sparse"
        arrays = {"idx": table.idx[: table.count], "val": table.val[: table.count]}
        extra = {"dim": table.dim, "nnz_cap": table.nnz_cap}
    else:
        raise DataException(f"cannot checkpoint {type(table).__name__}")
    arrays["valid"] = table.valid[: table.count]
    _save_arrays(path, arrays, epoch)
    _write_manifest(path, {"object": "table", "kind": kind,
                           "count": table.count, **extra}, epoch)


def load_table(path: str):
    m = _read_manifest(path)
    if m["object"] != "table":
        raise DataException(f'expected a table checkpoint, found "{m["object"]}"')
    count, ep = m["count"], m.get("epoch", 0)
    valid = _load(path, "valid", ep)
    if m["kind"] == "dense":
        table = DenseTable(m["dim"], dtype=jnp.dtype(m["dtype"]),
                           capacity=max(count, 8))
        if count:
            rows = table.insert(_load(path, "data", ep))
            dead = rows[~valid]
            if len(dead):
                table.delete(dead)
    elif m["kind"] == "bit":
        table = BitTable(m["dim"], capacity=max(count, 8))
        if count:
            packed = _load(path, "data", ep)
            table.data = jnp.zeros((table.capacity, table.words), jnp.uint32)
            table.data = table.data.at[:count].set(jnp.asarray(packed))
            table.count = count
            table.valid = table.valid.at[:count].set(jnp.asarray(valid))
    else:
        table = SparseTable(m["dim"], nnz_cap=m["nnz_cap"], capacity=max(count, 8))
        if count:
            table.idx = table.idx.at[:count].set(
                jnp.asarray(_load(path, "idx", ep)))
            table.val = table.val.at[:count].set(
                jnp.asarray(_load(path, "val", ep)))
            table.count = count
            table.valid = table.valid.at[:count].set(jnp.asarray(valid))
    return table


# ---------------------------------------------------------------------------
# indexes
# ---------------------------------------------------------------------------


def save_hnsw(idx, path: str) -> None:
    """Serialize the HNSW graph arrays (the FlushPages analogue,
    hnswbuild.c:303-316 — metapage + element + neighbor tuples)."""
    epoch = _begin_save(path)
    arrays = {
        "nbr0": idx.nbr0[: idx.n_elems],
        "nbr_up": idx.nbr_up[: idx.n_upper],
        "kept0": idx.kept0[: idx.n_elems],
        "kept_up": idx.kept_up[: idx.n_upper],
        "up_slot": idx.up_slot[: idx.n_elems],
        "levels": idx.levels[: idx.n_elems],
        "elem_rows": idx.elem_rows[: idx.n_elems],
    }
    for j, v in enumerate(idx.values):
        arrays[f"values{j}"] = v[: idx.n_elems]
    _save_arrays(path, arrays, epoch)

    def _plain(v):
        if isinstance(v, dict):
            return {k: _plain(x) for k, x in v.items()}
        return int(v) if isinstance(v, np.integer) else v

    rng_state = _plain(idx._rng.bit_generator.state)
    _write_manifest(path, {
        "object": "hnsw",
        "kind": idx.kind,
        "metric": idx.metric.name,
        "m": idx.m,
        "ef_construction": idx.ef_construction,
        "n_elems": idx.n_elems,
        "n_upper": idx.n_upper,
        # saved unroll width of nbr_up/kept_up (ADVICE r4: the width became
        # derived instead of the fixed L_MAX=12 in round 4 — record it so
        # readers can reconcile explicitly rather than shape-erroring)
        "nbr_up_width": int(idx.nbr_up.shape[1]),
        "entry": idx.entry,
        "entry_level": idx.entry_level,
        "free_slots": idx.free_slots,
        "seed": idx.seed,
        # level-assignment rng state: restoring it makes logical delta
        # replay deterministic (replica inserts draw the same levels the
        # primary drew — the WAL-replay-equality analogue, test/t/001)
        "rng_state": rng_state,
        # build knobs shape future insert waves — a replica replaying the
        # primary's inserts must partition them identically
        "wave_size": idx.wave_size,
        "beam_expand": idx.beam_expand,
        "backlink_mode": idx.backlink_mode,
        "dedup": idx.dedup,
    }, epoch)


def load_hnsw(table, path: str):
    from ..index.hnsw import HNSWIndex

    m = _read_manifest(path)
    if m["object"] != "hnsw":
        raise DataException(f'expected an hnsw checkpoint, found "{m["object"]}"')
    idx = HNSWIndex(table, Metric[m["metric"]], m=m["m"],
                    ef_construction=m["ef_construction"], seed=m["seed"],
                    build=False,
                    wave_size=m.get("wave_size", 1024),
                    beam_expand=m.get("beam_expand", 1),
                    backlink_mode=m.get("backlink_mode", "wholesale"),
                    dedup=m.get("dedup", True))
    n, nu, ep = m["n_elems"], m["n_upper"], m.get("epoch", 0)
    while idx.cap_e < max(n, 1):
        idx._grow()
    while idx.cap_u < max(nu, 1):
        idx.nbr_up = jnp.concatenate(
            [idx.nbr_up,
             jnp.full(idx.nbr_up.shape, -1, jnp.int32)])
        idx.kept_up = jnp.concatenate(
            [idx.kept_up, jnp.zeros(idx.kept_up.shape, jnp.bool_)])
        idx.cap_u *= 2
    idx.n_elems, idx.n_upper = n, nu
    idx.entry, idx.entry_level = m["entry"], m["entry_level"]
    idx.free_slots = list(m["free_slots"])
    if "rng_state" in m:
        idx._rng.bit_generator.state = m["rng_state"]
    if n:
        idx.nbr0 = idx.nbr0.at[:n].set(jnp.asarray(_load(path, "nbr0", ep)))
        try:  # kept flags added in round 2; older checkpoints lack them
            idx.kept0 = idx.kept0.at[:n].set(
                jnp.asarray(_load(path, "kept0", ep)))
        except (FileNotFoundError, KeyError):
            # all-False kept flags drop the sticky heuristic-kept protection
            # that keeps IP graphs connected under incremental updates
            # (measured 0.86 vs 0.97 build recall without it) — warn so the
            # degradation is visible instead of silent
            idx.notice_hook(
                "hnsw checkpoint predates heuristic-kept flags\n"
                "DETAIL:  Incremental inserts may degrade recall on "
                "inner-product indexes until the index is rebuilt.\n"
                "HINT:  REINDEX to restore sticky neighbor protection."
            )
        idx.up_slot[:n] = _load(path, "up_slot", ep)
        idx.levels[:n] = _load(path, "levels", ep)
        # the saving index may have been built with a deeper unroll (its
        # capacity/m or env differed) — honor the stored levels
        idx._ensure_unroll_depth(int(idx.levels[:n].max(initial=0)))
        idx.elem_rows[:n] = _load(path, "elem_rows", ep)
        # restored values are index-private (the heap they aliased at save
        # time is not this process's table buffer).  Base them on fresh
        # zero-filled (cap_e, ...) arrays — building on the table's live
        # buffers kept table-capacity-sized copies of current heap rows in
        # slots ≥ n (wasted HBM + stale heap data in index-private arrays;
        # ADVICE r4)
        idx._refresh_alias()
        idx._alias_values = False
        if idx.kind == "sparse":
            from ..ops import distance as _D

            shapes = [(idx.cap_e,) + tuple(v.shape[1:]) for v in idx.values]
            fills = (int(_D.SPARSE_PAD), 0)
            fresh = [jnp.full(s, f, v.dtype)
                     for s, f, v in zip(shapes, fills, idx.values)]
        else:
            fresh = [jnp.zeros((idx.cap_e,) + tuple(v.shape[1:]), v.dtype)
                     for v in idx.values]
        idx.values = tuple(
            v.at[:n].set(jnp.asarray(_load(path, f"values{j}", ep)))
            for j, v in enumerate(fresh))
        for e in range(n):
            for r in idx.elem_rows[e]:
                if r >= 0:
                    idx.row_to_elem[int(r)] = e
    if nu:
        # reconcile unroll widths: the saver allocated its own derived
        # depth (or the fixed 12 of pre-round-4 checkpoints, whose unused
        # tail levels are all -1)
        width = idx.nbr_up.shape[1]

        def fit(a, fill):
            # levels were loaded above, so width ≥ every stored level:
            # a wider save (e.g. the fixed 12 of pre-round-4 checkpoints)
            # carries only empty tail levels — slice them; a narrower one
            # pads with empties
            a = jnp.asarray(a)
            if a.shape[1] > width:
                return a[:, :width]
            if a.shape[1] < width:
                pad = jnp.full((nu, width - a.shape[1], idx.m), fill,
                               a.dtype)
                return jnp.concatenate([a, pad], axis=1)
            return a

        idx.nbr_up = idx.nbr_up.at[:nu].set(fit(_load(path, "nbr_up", ep), -1))
        try:
            idx.kept_up = idx.kept_up.at[:nu].set(
                fit(_load(path, "kept_up", ep), False))
        except (FileNotFoundError, KeyError):
            pass
    if idx.dedup and n:
        host_vals = [np.asarray(v[:n]) for v in idx.values]
        from ..index.hnsw import _dup_keys

        keys = _dup_keys(host_vals)
        for e in range(n):
            if idx.levels[e] >= 0:
                idx._dup_index[keys[e]] = e
    idx._dirty = True
    return idx


def save_ivfflat(idx, path: str) -> None:
    epoch = _begin_save(path)
    arrays = {
        "centroids_f32": idx.centroids_f32,
        "list_lens": idx.list_lens,
        "assignments": idx.assignments,
    }
    _save_arrays(path, arrays, epoch)
    _write_manifest(path, {
        "object": "ivfflat",
        "metric": idx.metric.name,
        "lists": idx.lists,
        "seed": idx.seed,
        "is_bit": idx._is_bit,
    }, epoch)


def load_ivfflat(table, path: str):
    from ..index.ivfflat import IVFFlatIndex
    from ..ops import distance as D

    m = _read_manifest(path)
    if m["object"] != "ivfflat":
        raise DataException(f'expected an ivfflat checkpoint, found "{m["object"]}"')
    idx = IVFFlatIndex(table, Metric[m["metric"]], lists=m["lists"],
                       seed=m["seed"], build=False)
    ep = m.get("epoch", 0)
    idx.centroids_f32 = jnp.asarray(_load(path, "centroids_f32", ep))
    if idx._is_bit:
        idx.centroids = D.pack_bits(idx.centroids_f32 > 0.5)
    else:
        idx.centroids = idx.centroids_f32
    # postings layout + the posting-ordered value copy are derived state —
    # rebuild from the assignment vector rather than persist (the
    # checkpoint stays small; one scatter + one gather at load)
    idx._load_postings(_load(path, "assignments", ep))
    return idx
