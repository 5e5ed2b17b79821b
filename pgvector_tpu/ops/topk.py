"""Tiled top-k search engine.

The exact-search ground truth (pgvector's no-index path: a seq scan feeding
``ORDER BY distance LIMIT k``, README.md:197) becomes a scan over HBM tiles:
each tile's (Q, T) score block is produced on the MXU/VPU, then merged into a
running (Q, k) result with ``lax.top_k``.  Peak memory is O(Q·T), never
O(Q·N), so a single chip streams arbitrarily large stores at HBM bandwidth.

Also hosts the cross-shard merge used by the multi-chip path (per-shard
partial top-k → concat over ICI → final top-k; SURVEY.md §2.4.6).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

#: transient-HBM budget for the grouped engine's refine gather — the
#: (Q, chunk, row) f32 block score_rows materializes per step
REFINE_BYTES = 2**30


def topk_smallest(
    scores: jnp.ndarray, k: int, ids: jnp.ndarray | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Smallest-k along the last axis.  Returns (dists, indices); when
    ``ids`` is given, indices are translated through it."""
    neg, sel = jax.lax.top_k(-scores, k)
    if ids is not None:
        if ids.ndim == 1:
            sel = ids[sel]
        else:
            sel = jnp.take_along_axis(ids, sel, axis=-1)
    return -neg, sel


def merge_topk(
    d_a: jnp.ndarray, i_a: jnp.ndarray, d_b: jnp.ndarray, i_b: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two (…, ka)/(…, kb) candidate sets into the smallest k."""
    d = jnp.concatenate([d_a, d_b], axis=-1)
    i = jnp.concatenate([i_a, i_b], axis=-1)
    return topk_smallest(d, k, ids=i)


def grouped_exact_topk(
    score_tile: Callable[..., jnp.ndarray],
    score_rows: Callable[..., jnp.ndarray],
    db_cols: Tuple[jnp.ndarray, ...],
    n: int,
    k: int,
    group: int = 16,
    tile: int = 65536,
    valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via group-min filtering — the TPU-shaped replacement for
    per-element top-k merges.

    Per-element selection work is what made exact scans ~1000× slower than
    their matmuls (each element pays O(k) merge ops; the matmul pays O(D)
    MXU flops that run 2 orders of magnitude faster per op).  This version
    pays O(1) per element:

    1. **filter** — stream DB tiles; each (Q, T) score block reduces to
       per-``group`` minima (a cheap reshape-min XLA fuses into the matmul
       consumer, so full score blocks never round-trip through HBM),
       giving ``gmins (Q, N/group)``.
    2. **select** — ``lax.top_k`` picks the k smallest-min groups per
       query.  This is EXACT: the k nearest elements have distance ≤ d_k,
       so every group containing one has min ≤ d_k, and at most k groups
       can have min ≤ d_k (each such group contributes ≥1 element ≤ d_k).
       Ties at d_k may swap tied elements — a valid top-k set either way.
    3. **refine** — gather the k·group candidate rows (Q·k·group total, a
       ~10⁻³ fraction of N) and re-score them exactly; final top-k.

    ``score_tile`` maps db-col tiles → (Q, T) scores; ``score_rows`` maps
    (Q, C) row ids → (Q, C) scores (exact, gathering from the full cols).
    Returns (dists, ids) like tiled_topk.
    """
    tile = min(tile, max(n, group))
    tile = max(group, tile - tile % group)
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile

    def pad(col: jnp.ndarray) -> jnp.ndarray:
        col = col[:n]
        if n_pad == col.shape[0]:
            return col
        pw = [(0, n_pad - col.shape[0])] + [(0, 0)] * (col.ndim - 1)
        return jnp.pad(col, pw)

    cols = tuple(pad(c).reshape((n_tiles, tile) + c.shape[1:]) for c in db_cols)
    row_valid = jnp.arange(n_pad, dtype=jnp.int32) < n
    if valid is not None:
        row_valid = row_valid & pad(valid)
    rv_tiles = row_valid.reshape(n_tiles, tile)
    q_count = jax.eval_shape(score_tile, *(c[0] for c in cols)).shape[0]

    def body(_, inp):
        tile_cols, tile_valid = inp
        s = score_tile(*tile_cols).astype(jnp.float32)
        s = jnp.where(tile_valid[None, :], s, jnp.inf)
        gm = jnp.min(s.reshape(q_count, tile // group, group), axis=-1)
        return None, gm

    _, gms = jax.lax.scan(body, None, (cols, rv_tiles))
    # (n_tiles, Q, tile/group) → (Q, N/group)
    gms = jnp.moveaxis(gms, 1, 0).reshape(q_count, -1)
    kk = min(k, gms.shape[1])
    _, gsel = jax.lax.top_k(-gms, kk)  # (Q, kk) group ids
    cand = (gsel[:, :, None] * group
            + jnp.arange(group, dtype=gsel.dtype)).reshape(q_count, kk * group)
    ok = row_valid[jnp.minimum(cand, n_pad - 1)] & (cand < n)
    # bound the refine gather: score_rows materializes (Q, C, row) f32, and
    # C = k·group grows with both k and the group width — at k=100/group=128
    # an unchunked gather is tens of GB.  Chunk the candidate axis with a
    # running merge (exact: the top-k of a union is inside the union of
    # per-chunk top-ks).
    row_f32 = 4 * sum(max(1, math.prod(c.shape[2:])) for c in cols)
    cc = max(group,
             (REFINE_BYTES // max(1, q_count * row_f32)) // group * group)
    if cc >= cand.shape[1]:
        s = score_rows(jnp.where(ok, cand, 0)).astype(jnp.float32)
        s = jnp.where(ok, s, jnp.inf)
        d, i = topk_smallest(s, min(k, s.shape[1]), ids=cand)
    else:
        d = jnp.full((q_count, k), jnp.inf, jnp.float32)
        i = jnp.full((q_count, k), -1, cand.dtype)
        for s0 in range(0, cand.shape[1], cc):
            c_blk = cand[:, s0:s0 + cc]
            o_blk = ok[:, s0:s0 + cc]
            s = score_rows(jnp.where(o_blk, c_blk, 0)).astype(jnp.float32)
            s = jnp.where(o_blk, s, jnp.inf)
            d, i = merge_topk(d, i, s, c_blk, k)
    if d.shape[1] < k:
        q = d.shape[0]
        d = jnp.concatenate(
            [d, jnp.full((q, k - d.shape[1]), jnp.inf, d.dtype)], axis=1)
        i = jnp.concatenate(
            [i, jnp.full((q, k - i.shape[1]), -1, i.dtype)], axis=1)
    return d, jnp.where(jnp.isinf(d), -1, i)


def tiled_topk(
    score_tile: Callable[..., jnp.ndarray],
    db_cols: Tuple[jnp.ndarray, ...],
    n: int,
    k: int,
    tile: int = 8192,
    valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stream the database through ``score_tile`` and keep the smallest k.

    ``db_cols`` is a tuple of arrays with leading axis N (vectors, norms,
    sparse indices, ... — whatever the score function needs); ``score_tile``
    maps one tile of each column to a (Q, T) score block.  ``valid`` masks
    deleted rows (the delete-mask analogue of dead index tuples).

    Returns (dists, ids) of shape (Q, k); empty slots hold +inf / -1.
    """
    tile = min(tile, max(n, 1))
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile

    def pad(col: jnp.ndarray) -> jnp.ndarray:
        col = col[:n]  # columns may be capacity-padded beyond the row count
        if n_pad == col.shape[0]:
            return col
        pad_width = [(0, n_pad - col.shape[0])] + [(0, 0)] * (col.ndim - 1)
        return jnp.pad(col, pad_width)

    cols = tuple(pad(c).reshape((n_tiles, tile) + c.shape[1:]) for c in db_cols)
    row_valid = jnp.arange(n_pad, dtype=jnp.int32) < n
    if valid is not None:
        row_valid = row_valid & pad(valid)
    row_valid = row_valid.reshape(n_tiles, tile)
    bases = (jnp.arange(n_tiles, dtype=jnp.int32) * tile)

    # probe one tile to get Q and dtype without committing memory
    q_count = jax.eval_shape(score_tile, *(c[0] for c in cols)).shape[0]

    init = (
        jnp.full((q_count, k), jnp.inf, dtype=jnp.float32),
        jnp.full((q_count, k), -1, dtype=jnp.int32),
    )

    def body(carry, inp):
        best_d, best_i = carry
        tile_cols, tile_valid, base = inp
        s = score_tile(*tile_cols).astype(jnp.float32)
        s = jnp.where(tile_valid[None, :], s, jnp.inf)
        ids = base + jnp.arange(tile, dtype=jnp.int32)
        d, i = merge_topk(best_d, best_i, s, jnp.broadcast_to(ids, s.shape), k)
        # deleted/padded rows carry +inf scores; keep their ids at -1
        i = jnp.where(jnp.isinf(d), -1, i)
        return (d, i), None

    (best_d, best_i), _ = jax.lax.scan(body, init, (cols, row_valid, bases))
    return best_d, best_i
