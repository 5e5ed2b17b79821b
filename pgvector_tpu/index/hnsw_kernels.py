"""HNSW device kernels — the batched/MXU rewrite of the reference's
algorithmic core (src/hnswutils.c).

The reference walks the graph one candidate at a time: HnswSearchLayer
(Algorithm 2, hnswutils.c:822-985) pops the nearest unexpanded candidate
from a pairing heap, loads its neighbors from buffer pages, and computes one
distance per fmgr call.  Here the same algorithm runs for a whole *batch* of
queries per kernel: the pool (C and W merged into one ef-bounded sorted
array with expanded flags), the visited set (a bool plane scatter-set per
hop), the per-hop neighbor gather, and the distance evaluation are all
(Q, ·)-shaped device ops, so every hop is one gather + one batched distance
block + one small sort instead of Q·lm pointer chases.

SelectNeighbors (Algorithm 4, hnswutils.c:1062-1163) becomes a masked
pairwise-distance kernel vmapped over elements: the sequential keep/prune
decision runs as a fori_loop over the (static) candidate count, with the
kept-pruned backfill expressed as a rank trick.

All kernels are shape-static and jit-cached per (ef, lm, kind) combination.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import distance as D
from ..ops.metric import Metric

BIG = jnp.float32(3.0e38)


# ---------------------------------------------------------------------------
# distance closure: query batch -> distances to a (Q, R) block of element ids
# ---------------------------------------------------------------------------


def make_scorer(kind: str, metric: Metric, data):
    """Returns score(qs, rows) -> (Q, R) f32 distances, where ``qs`` is the
    pre-formed query rep and ``rows`` are element ids (Q, R); negative ids
    give +inf.  ``data`` is the index's own value arrays (the vector copies
    stored in index tuples, hnsw.h:372-382)."""
    if kind == "dense":
        (vecs,) = data

        def score(qs, rows):
            safe = jnp.maximum(rows, 0)
            v = vecs[safe]  # (Q, R, D)
            qf = qs.astype(jnp.float32)[:, None, :]
            vf = v.astype(jnp.float32)
            if metric is Metric.L2:
                d = jnp.sum((qf - vf) ** 2, axis=-1)
            elif metric is Metric.IP or metric is Metric.COSINE:
                # cosine opclasses store normalized values and order by -ip
                # (sql/vector.sql:437-441)
                d = -jnp.sum(qf * vf, axis=-1)
            elif metric is Metric.L1:
                d = jnp.sum(jnp.abs(qf - vf), axis=-1)
            else:
                raise ValueError(metric)
            return jnp.where(rows >= 0, d, jnp.inf)

        return score
    if kind == "bit":
        (words,) = data

        def score(qs, rows):
            safe = jnp.maximum(rows, 0)
            w = words[safe]  # (Q, R, W)
            x = qs[:, None, :]
            if metric is Metric.HAMMING:
                d = jnp.sum(
                    jax.lax.population_count(jnp.bitwise_xor(x, w)).astype(jnp.int32),
                    axis=-1,
                ).astype(jnp.float32)
            elif metric is Metric.JACCARD:
                ab = jnp.sum(
                    jax.lax.population_count(jnp.bitwise_and(x, w)).astype(jnp.int32),
                    axis=-1,
                ).astype(jnp.float32)
                aa = D.popcount_rows(qs).astype(jnp.float32)[:, None]
                bb = jnp.sum(
                    jax.lax.population_count(w).astype(jnp.int32), axis=-1
                ).astype(jnp.float32)
                denom = aa + bb - ab
                d = jnp.where(ab == 0, 1.0, 1.0 - ab / jnp.where(denom > 0, denom, 1.0))
            else:
                raise ValueError(metric)
            return jnp.where(rows >= 0, d, jnp.inf)

        return score
    if kind == "sparse":
        idx_arr, val_arr = data

        def score(qs, rows):
            q_idx, q_val = qs  # (Q, P), (Q, P)
            safe = jnp.maximum(rows, 0)
            ridx = idx_arr[safe]  # (Q, R, P)
            rval = val_arr[safe]

            def per_query(qi, qv, ri, rv):
                return D.sparse_scores(metric, qi, qv, ri, rv)

            d = jax.vmap(per_query)(q_idx, q_val, ridx, rval)
            return jnp.where(rows >= 0, d, jnp.inf)

        return score
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# pool ops
# ---------------------------------------------------------------------------


def _merge_pool(pool_d, pool_i, pool_x, new_d, new_i, ef: int):
    """Merge new candidates into the sorted (d, id, expanded) pool, keep ef.
    The single sorted array plays both heaps of Algorithm 2: C = unexpanded
    entries, W = the ef best seen."""
    d = jnp.concatenate([pool_d, new_d], axis=1)
    i = jnp.concatenate([pool_i, new_i], axis=1)
    x = jnp.concatenate([pool_x, jnp.zeros_like(new_i, dtype=jnp.bool_)], axis=1)
    d, i, x = jax.lax.sort((d, i, x.astype(jnp.int32)), num_keys=1)
    return d[:, :ef], i[:, :ef], x[:, :ef].astype(jnp.bool_)


def search_layer(
    score,
    neighbors_of,
    qs,
    init_d: jnp.ndarray,  # (Q, E) distances of entry candidates
    init_i: jnp.ndarray,  # (Q, E) element ids (-1 = none)
    visited: jnp.ndarray,  # (Q, cap) bool — consumed and returned
    ef: int,
    lm: int,
    max_steps: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Algorithm 2 (HnswSearchLayer, hnswutils.c:822-985), batched.

    ``score(qs, rows)`` and ``neighbors_of(elems) -> (Q, lm)`` close over
    the graph arrays.  Returns (pool_d, pool_i, visited); the pool is sorted
    ascending with -1/inf padding.
    """
    nq = init_i.shape[0]
    pad = ef - init_i.shape[1]
    if pad < 0:
        init_d, init_i = init_d[:, :ef], init_i[:, :ef]
        pad = 0
    pool_d = jnp.concatenate(
        [jnp.where(init_i >= 0, init_d, jnp.inf),
         jnp.full((nq, pad), jnp.inf, jnp.float32)], axis=1)
    pool_i = jnp.concatenate(
        [init_i, jnp.full((nq, pad), -1, jnp.int32)], axis=1)
    pool_d, pool_i = jax.lax.sort((pool_d, pool_i), num_keys=1)
    pool_x = jnp.zeros((nq, ef), jnp.bool_)
    # mark entries visited
    visited = _set_visited(visited, pool_i)
    rows_q = jnp.arange(nq, dtype=jnp.int32)

    def cond(state):
        _, _, _, _, step, done = state
        return jnp.logical_and(~jnp.all(done), step < max_steps)

    def body(state):
        pool_d, pool_i, pool_x, visited, step, _ = state
        # nearest unexpanded candidate per query
        cand_mask = (~pool_x) & (pool_i >= 0)
        cand_d = jnp.where(cand_mask, pool_d, jnp.inf)
        sel = jnp.argmin(cand_d, axis=1)  # (Q,)
        sel_d = jnp.take_along_axis(cand_d, sel[:, None], axis=1)[:, 0]
        worst = pool_d[:, ef - 1]
        # done: no unexpanded candidate, or best unexpanded is worse than a
        # full pool's worst (the W-bound termination of Algorithm 2)
        done = jnp.isinf(sel_d) | (sel_d > worst)
        # expand: mark selected
        pool_x = pool_x.at[rows_q, sel].set(jnp.where(done, pool_x[rows_q, sel], True))
        sel_elem = jnp.where(done, -1, pool_i[rows_q, sel])
        nbrs = neighbors_of(sel_elem)  # (Q, lm)
        nbrs = jnp.where(sel_elem[:, None] >= 0, nbrs, -1)
        # drop visited, mark visited
        seen = _get_visited(visited, nbrs)
        nbrs = jnp.where(seen, -1, nbrs)
        visited = _set_visited(visited, nbrs)
        nd = score(qs, nbrs)
        pool_d, pool_i, pool_x = _merge_pool(pool_d, pool_i, pool_x, nd, nbrs, ef)
        return pool_d, pool_i, pool_x, visited, step + 1, done

    state = (pool_d, pool_i, pool_x, visited,
             jnp.int32(0), jnp.zeros((nq,), jnp.bool_))
    pool_d, pool_i, pool_x, visited, _, _ = jax.lax.while_loop(cond, body, state)
    return pool_d, pool_i, visited


def _set_visited(visited: jnp.ndarray, elems: jnp.ndarray) -> jnp.ndarray:
    """Scatter-set True at (q, elem) — idempotent, so duplicate ids are
    safe (the tidhash/pointer-hash replacement, hnswutils.c:40-107)."""
    nq = visited.shape[0]
    rows = jnp.broadcast_to(jnp.arange(nq, dtype=jnp.int32)[:, None], elems.shape)
    safe = jnp.maximum(elems, 0)
    updates = elems >= 0
    return visited.at[rows.reshape(-1), safe.reshape(-1)].max(updates.reshape(-1))


def _get_visited(visited: jnp.ndarray, elems: jnp.ndarray) -> jnp.ndarray:
    nq = visited.shape[0]
    rows = jnp.broadcast_to(jnp.arange(nq, dtype=jnp.int32)[:, None], elems.shape)
    safe = jnp.maximum(elems, 0)
    return visited[rows.reshape(-1), safe.reshape(-1)].reshape(elems.shape) & (elems >= 0)


def greedy_descent(
    score,
    neighbors_of_level,
    qs,
    start: jnp.ndarray,  # (Q,) element ids
    start_d: jnp.ndarray,  # (Q,)
    level: int,
    m: int,
    max_steps: int,
):
    """ef=1 greedy walk on one upper level (the entry-point descent of
    Algorithm 5 / HnswFindElementNeighbors, hnswutils.c:1293-1306)."""

    def cond(state):
        _, _, moved, step = state
        return jnp.logical_and(jnp.any(moved), step < max_steps)

    def body(state):
        cur, cur_d, _, step = state
        nbrs = neighbors_of_level(cur, level)  # (Q, m)
        nd = score(qs, nbrs)
        best = jnp.argmin(nd, axis=1)
        best_d = jnp.take_along_axis(nd, best[:, None], axis=1)[:, 0]
        best_i = jnp.take_along_axis(nbrs, best[:, None], axis=1)[:, 0]
        move = best_d < cur_d
        cur = jnp.where(move, best_i, cur)
        cur_d = jnp.where(move, best_d, cur_d)
        return cur, cur_d, move, step + 1

    nq = start.shape[0]
    state = (start, start_d, jnp.ones((nq,), jnp.bool_), jnp.int32(0))
    cur, cur_d, _, _ = jax.lax.while_loop(cond, body, state)
    return cur, cur_d


# ---------------------------------------------------------------------------
# SelectNeighbors heuristic (Algorithm 4 — hnswutils.c:1062-1163)
# ---------------------------------------------------------------------------


def select_neighbors(
    base_d: jnp.ndarray,  # (C,) distance of each candidate to the base element
    pair_d: jnp.ndarray,  # (C, C) candidate pairwise distances
    valid: jnp.ndarray,  # (C,) bool
    lm: int,
) -> jnp.ndarray:
    """Returns (lm,) selected candidate *positions* (-1 padded), kept-first
    then closest-pruned backfill (the keepPrunedConnections behavior,
    hnswutils.c:1133-1156)."""
    c = base_d.shape[0]
    big_d = jnp.where(valid, base_d, jnp.inf)
    order = jnp.argsort(big_d)  # closest-first processing

    def body(t, state):
        kept_count, kept, min_pair = state
        i = order[t]
        ok = (
            (big_d[i] < min_pair[i])
            & (kept_count < lm)
            & jnp.isfinite(big_d[i])
        )
        kept = kept.at[i].set(kept[i] | ok)
        min_pair = jnp.where(ok, jnp.minimum(min_pair, pair_d[:, i]), min_pair)
        return kept_count + ok.astype(jnp.int32), kept, min_pair

    kept_count, kept, _ = jax.lax.fori_loop(
        0, c, body, (jnp.int32(0), jnp.zeros((c,), jnp.bool_), jnp.full((c,), jnp.inf))
    )
    # rank: kept first (by distance), then pruned-but-valid (by distance),
    # invalid last
    rank = jnp.where(kept, big_d, jnp.where(jnp.isfinite(big_d), big_d + BIG, jnp.inf))
    neg, pos = jax.lax.top_k(-rank, lm)
    return jnp.where(jnp.isinf(-neg), -1, pos)


select_neighbors_batch = jax.vmap(select_neighbors, in_axes=(0, 0, 0, None))
