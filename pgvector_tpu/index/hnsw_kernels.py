"""HNSW device kernels — the batched/MXU rewrite of the reference's
algorithmic core (src/hnswutils.c).

The reference walks the graph one candidate at a time: HnswSearchLayer
(Algorithm 2, hnswutils.c:822-985) pops the nearest unexpanded candidate
from a pairing heap, loads its neighbors from buffer pages, and computes one
distance per fmgr call.  Here the same algorithm runs for a whole *batch* of
queries per kernel: the pool (C and W merged into one ef-bounded sorted
array with expanded flags), the visited set (a bounded per-query hash table,
scatter-probed per hop), the per-hop neighbor gather, and the distance are all
(Q, ·)-shaped device ops, so every hop is one gather + one batched distance
block + one small sort instead of Q·lm pointer chases.

SelectNeighbors (Algorithm 4, hnswutils.c:1062-1163) becomes a masked
pairwise-distance kernel: pairwise distances come from one batched matmul
(dense L2/IP/cos) or a broadcast block (L1/bit/sparse), and the sequential
keep/prune decision runs as a fori_loop of elementwise ops.

Two loop drivers share the same hop step:

- default: the beam loop is a ``lax.while_loop`` inside one jitted kernel
  (wave_search / query_search) — minimal dispatch, full fusion.  Dynamic
  entry level + fixed-width neighbor gathers keep the jit-variant count
  small (one compile serves every graph height ≤ l_unroll).
- opt-in (PGVECTOR_TPU_HOST_LOOPS=1): the host drives the hop loop calling
  a small jitted step (`_hop_step`) — identical math, host-checked
  termination.  Useful when device compiles are remote/expensive.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import distance as D
from ..ops.metric import Metric

BIG = jnp.float32(3.0e38)


def use_pallas_tail() -> bool:
    """Opt-in fused VMEM hop tail for the packed scan
    (PGVECTOR_TPU_PALLAS_TAIL=1) — see ops/pallas_hop.py."""
    import os

    return os.environ.get("PGVECTOR_TPU_PALLAS_TAIL", "0") == "1"


def use_host_loop() -> bool:
    """Host-driven hop loops are an opt-in fallback (useful when device
    compiles are remote/slow); the mono-jit while_loop path is the default
    on every backend."""
    import os

    return os.environ.get("PGVECTOR_TPU_HOST_LOOPS", "0") == "1"


# ---------------------------------------------------------------------------
# distance closure: query batch -> distances to a (Q, R) block of element ids
# ---------------------------------------------------------------------------


def make_scorer(kind: str, metric: Metric, data, sdim: int = 0):
    """Returns score(qs, rows) -> (Q, R) f32 distances, where ``qs`` is the
    pre-formed query rep and ``rows`` are element ids (Q, R); negative ids
    give +inf.  ``data`` is the index's own value arrays (the vector copies
    stored in index tuples, hnsw.h:372-382).

    ``sdim > 0`` (sparse L2/IP/cos) selects the *densified-query* scorer:
    the query batch is scattered once into dense (Q, sdim+1) f32 lanes and
    each candidate's query-side values come from a direct gather at its CSR
    indices — no searchsorted merge join.  Bitwise-identical to
    D.sparse_scores within one program (same qv_at values, same last-axis
    reduction — tests/test_hnsw.py pins this; across *different* XLA
    programs either scorer's reduction may be reassociated by fusion, so
    only allclose holds), strictly cheaper (gather vs binary search per
    entry), and it avoids the merge-join gather kernel that hard-crashes
    this image's TPU worker at large shapes (see flat.py's densified-tile
    note / BENCH_NOTES r5)."""
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

        if sdim > 0 and metric in (Metric.L2, Metric.IP, Metric.COSINE):

            def score(qs, rows):
                q_idx, q_val = qs  # (Q, P), (Q, P)
                nq = q_idx.shape[0]
                # scatter-densify the queries: pads (SPARSE_PAD, val 0)
                # land in an overflow column; indices are distinct per row
                # so add == set
                col = jnp.minimum(q_idx, sdim).astype(jnp.int32)
                qd = (jnp.zeros((nq, sdim + 1), jnp.float32)
                      .at[jnp.arange(nq, dtype=jnp.int32)[:, None], col]
                      .add(q_val))
                safe = jnp.maximum(rows, 0)
                ridx = idx_arr[safe]  # (Q, R, P)
                rval = val_arr[safe]
                ci = jnp.minimum(ridx, sdim).astype(jnp.int32)
                qv_at = jax.vmap(lambda dq, c: dq[c])(qd, ci)  # (Q, R, P)
                ip = jnp.sum(qv_at * rval, axis=-1)
                if metric is Metric.IP:
                    d = -ip
                else:
                    q_sq = jnp.sum(q_val * q_val, axis=-1)[:, None]
                    r_sq = jnp.sum(rval * rval, axis=-1)
                    if metric is Metric.L2:
                        d = jnp.maximum(q_sq + r_sq - 2.0 * ip, 0.0)
                    else:  # COSINE
                        denom = jnp.sqrt(q_sq * r_sq)
                        cos = jnp.where(
                            denom > 0, ip / jnp.where(denom > 0, denom, 1.0),
                            -jnp.inf)
                        d = 1.0 - cos
                return jnp.where(rows >= 0, d, jnp.inf)

            return score

        def score(qs, rows):
            q_idx, q_val = qs  # (Q, P), (Q, P)
            safe = jnp.maximum(rows, 0)
            ridx = idx_arr[safe]  # (Q, R, P)
            rval = val_arr[safe]
            d = jax.vmap(lambda qi, qv, ri, rv: D.sparse_scores(metric, qi, qv, ri, rv))(
                q_idx, q_val, ridx, rval
            )
            return jnp.where(rows >= 0, d, jnp.inf)

        return score
    raise ValueError(kind)


def dense_point_scores(metric: Metric, qs, vf, rows):
    """Per-candidate dense distances when the value block is already in
    registers: (Q, W, D) values vs (Q, D) queries → (Q, W) f32.  Same math
    as make_scorer's dense scorer (element order, f32 accumulate), minus
    the per-row value gather."""
    qf = qs.astype(jnp.float32)[:, None, :]
    vf = vf.astype(jnp.float32)
    if metric is Metric.L2:
        d = jnp.sum((qf - vf) ** 2, axis=-1)
    elif metric is Metric.IP or metric is Metric.COSINE:
        d = -jnp.sum(qf * vf, axis=-1)
    elif metric is Metric.L1:
        d = jnp.sum(jnp.abs(qf - vf), axis=-1)
    else:
        raise ValueError(metric)
    return jnp.where(rows >= 0, d, jnp.inf)


def _int8_point_scores(metric: Metric, qs_p, pscale, pnorm2, v, nbrs):
    """Scores against an int8 per-dim-scaled neighbor slab WITHOUT
    materializing an f32 copy of the (Q, W, D) block — the explicit
    dequant-multiply form OOM'd HBM at 960-d×batch-4000 (HLO temps 9.71 G
    on a 15.75 G chip, r4 lane 1).  The cross term q·(s⊙c) rides a native
    int8×int8→int32 MXU dot with the scale-folded query re-quantized
    per row; L2 closes with q² and exact precomputed dequantized-row
    norms.  Query-side quantization adds ≤1/127 relative error on top of
    the cache's ≤1/254 — admission stays near-exact and the final pool is
    exact-f32 re-ranked regardless.  L1 has no dot form and keeps the
    elementwise dequant (memory-heavy at huge dims — the auto plan only
    picks int8 for L2/IP/cosine)."""
    qf = qs_p.astype(jnp.float32) * pscale          # (Q, D): q ⊙ s
    if metric is Metric.L1:
        d = jnp.sum(jnp.abs(qs_p.astype(jnp.float32)[:, None, :]
                            - v.astype(jnp.float32) * pscale), axis=-1)
        return jnp.where(nbrs >= 0, d, jnp.inf)
    sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=1), 1e-30) / 127.0
    qc = jnp.clip(jnp.round(qf / sq[:, None]), -127, 127).astype(jnp.int8)
    cross = jax.lax.dot_general(
        qc[:, None, :], v,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)[:, 0, :].astype(jnp.float32)
    cross = cross * sq[:, None]
    if metric is Metric.L2:
        q2 = jnp.sum(jnp.square(qs_p.astype(jnp.float32)), axis=1)
        d = q2[:, None] - 2.0 * cross + pnorm2[jnp.maximum(nbrs, 0)]
    elif metric is Metric.IP or metric is Metric.COSINE:
        d = -cross
    else:
        raise ValueError(metric)
    return jnp.where(nbrs >= 0, d, jnp.inf)


def elems_as_queries(kind: str, values, elems):
    """Use stored elements as the query side (build-time searches)."""
    safe = jnp.maximum(elems, 0)
    if kind == "sparse":
        return (values[0][safe], values[1][safe])
    return values[0][safe]


@functools.partial(jax.jit, static_argnames=("kind", "metric", "sdim"))
def score_block(kind: str, metric: Metric, values, qs, rows, sdim: int = 0):
    return make_scorer(kind, metric, values, sdim)(qs, rows)


# ---------------------------------------------------------------------------
# neighbor gather: dynamic level, fixed 2m width
# ---------------------------------------------------------------------------


def _neighbors_closure(nbr0, nbr_up, up_slot):
    """Neighbor gather with a *dynamic* level and a fixed 2m output width:
    level 0 reads nbr0 (2m wide); upper levels read nbr_up[:, level-1]
    (m wide) padded with -1, so every beam level shares one compiled shape."""
    m2 = nbr0.shape[1]
    m = nbr_up.shape[2]

    def neighbors_of_level(elems, level):
        safe = jnp.maximum(elems, 0)

        def level0(_):
            return nbr0[safe]

        def upper(_):
            slot = up_slot[safe]
            lvl_idx = jnp.maximum(level - 1, 0)
            out = nbr_up[jnp.maximum(slot, 0), lvl_idx]
            out = jnp.where(slot[:, None] >= 0, out, -1)
            pad = jnp.full(out.shape[:-1] + (m2 - m,), -1, jnp.int32)
            return jnp.concatenate([out, pad], axis=-1)

        out = jax.lax.cond(jnp.asarray(level) == 0, level0, upper, None)
        return jnp.where(elems[:, None] >= 0, out, -1)

    return neighbors_of_level


# ---------------------------------------------------------------------------
# visited set — bounded per-query open-addressed hash table
#
# The reference's visited set is a per-scan hash table (tidhash/pointer-hash,
# hnswutils.c:40-107).  The round-1 TPU design used a bool[Q, cap_e] plane —
# O(Q·N) HBM that dominates traffic per hop and reaches ~1 GB per beam call
# at 1M elements.  This is the bounded replacement: an int32[Q, H] table
# (H = O(ef), power of two) with two multiplicative-hash probe positions.
#
# Semantics: membership is checked by exact id equality, so there are no
# false "already visited" answers (which would hurt recall).  Inserts only
# land in EMPTY slots (scatter-max against -1-initialized slots never evicts
# an occupant); an insert that finds both slots occupied simply fails, and
# the element may be re-scored on a later hop — wasted work, never wrongness.
# An explicit pool-membership check in the hop body keeps the ef pool
# duplicate-free regardless.
# ---------------------------------------------------------------------------

_V_SALT1 = jnp.uint32(0x9E3779B1)  # 2^32 / golden ratio (Knuth)
_V_SALT2 = jnp.uint32(0x85EBCA77)  # murmur3 c2


def visited_mode() -> str:
    """Visited-set structure for non-resumable searches, from
    PGVECTOR_TPU_VISITED: ``off`` (default — no visited set), ``hash1``
    (single-probe hash table), or ``hash2`` (exact 2-choice hash table).

    ``off`` is sound for plain scans: the pool-membership check keeps the
    ef pool duplicate-free, expansion flags prevent re-expanding in-pool
    members, and the W-bound termination still holds — an evicted node can
    only re-enter (and be re-expanded) while it beats the pool's worst, so
    the cost is bounded extra hops, never wrongness.  Iterative scans
    always use hash2: ResumeScanItems' contract (hnswscan.c:61-87) needs a
    persistent visited set across resumes.

    Measured on v5e @ 100k, Q=1000: the 2-scatter probe was 7.0ms of a
    7.8ms hop (90% of scan time); dropping it gave hash2 2448→off 8783
    QPS at ef=40 with IDENTICAL recall (0.9979) and identical hop counts
    (25) — on real beam searches the revisit-suppression the table buys
    is already provided by the pool checks."""
    import os

    return os.environ.get("PGVECTOR_TPU_VISITED", "off")


def visited_capacity(ef: int) -> int:
    """Table width per query: sized so the typical layer-0 visit count
    (~ef·lm/2 scored candidates) stays under ~1/3 load with 2-choice
    probing.  Power of two for mask-free slot math."""
    h = 8192
    while h < 128 * ef:
        h *= 2
    return h


def visited_init(nq: int, ef: int, mode: str = "hash2") -> jnp.ndarray:
    if mode == "off":
        return jnp.full((nq, 8), -1, jnp.int32)  # dummy, never probed
    return jnp.full((nq, visited_capacity(ef)), -1, jnp.int32)


def _v_slots(table: jnp.ndarray, elems: jnp.ndarray):
    bits = int(table.shape[1]).bit_length() - 1
    shift = jnp.uint32(32 - bits)
    x = elems.astype(jnp.uint32)
    s1 = ((x * _V_SALT1) >> shift).astype(jnp.int32)
    s2 = ((x * _V_SALT2) >> shift).astype(jnp.int32)
    return s1, s2


def visited_probe(table: jnp.ndarray, elems: jnp.ndarray,
                  mode: str = "hash2"):
    """Membership check + insert for a (Q, R) block of element ids
    (negative ids ignored).  Returns (table, seen) where ``seen`` is True
    only for elements already present before this call.  ``hash1`` uses a
    single probe slot (half the scatter cost; a failed insert just means
    the element may be re-scored later — wasted work, never wrongness)."""
    if mode == "off":
        return table, jnp.zeros(elems.shape, jnp.bool_)
    nq = table.shape[0]
    rows = jnp.broadcast_to(
        jnp.arange(nq, dtype=jnp.int32)[:, None], elems.shape
    ).reshape(-1)
    s1, s2 = _v_slots(table, elems)
    f1, f2 = s1.reshape(-1), s2.reshape(-1)
    live = elems >= 0
    occ1 = table[rows, f1].reshape(elems.shape)
    if mode == "hash1":
        seen = (occ1 == elems) & live
        want1 = (~seen) & live & (occ1 < 0)
        table = table.at[rows, f1].max(
            jnp.where(want1, elems, -1).reshape(-1))
        return table, seen
    occ2 = table[rows, f2].reshape(elems.shape)
    seen = ((occ1 == elems) | (occ2 == elems)) & live
    # insert pass 1: empty slot 1 (scatter-max: occupied slots receive -1
    # and are untouched; racing inserts into one empty slot pick a winner)
    want1 = (~seen) & live & (occ1 < 0)
    table = table.at[rows, f1].max(
        jnp.where(want1, elems, -1).reshape(-1))
    won1 = table[rows, f1].reshape(elems.shape) == elems
    # insert pass 2: the rest try slot 2.  Occupancy must be RE-READ after
    # the pass-1 scatter — the stale pre-pass occ2 can look empty for a slot
    # pass 1 just filled, and the scatter-max would then evict that fresh
    # occupant (A at f1(A) evicted by B>A with f2(B)==f1(A)), breaking the
    # "an insert never evicts an occupant" invariant ResumeScanItems
    # depends on.
    rem = (~seen) & live & ~(want1 & won1)
    occ2 = table[rows, f2].reshape(elems.shape)
    want2 = rem & (occ2 < 0)
    table = table.at[rows, f2].max(
        jnp.where(want2, elems, -1).reshape(-1))
    return table, seen


# ---------------------------------------------------------------------------
# one beam hop (the body of Algorithm 2)
# ---------------------------------------------------------------------------


def _hop_body(score, neighbors_of, qs, pool_d, pool_i, pool_x, visited,
              ef: int, expand: int = 1, disc=None, vmode: str = "hash2",
              packed=None, metric=None, pallas_tail: bool = False,
              prune: int = 0):
    """One expansion hop: pop the ``expand`` nearest unexpanded candidates
    per query, gather their neighbors, score the unvisited ones, merge into
    the pool.  expand=1 is exactly Algorithm 2's best-first order;
    expand>1 trades a slightly relaxed expansion order for ~expand× fewer
    sequential hops (the standard GPU/TPU beam widening — same ef bound,
    recall validated by the test floors).

    ``disc`` — optional (disc_d, disc_i) discarded pool: candidates evicted
    past the ef bound are merged into it (the discarded pairing heap of
    iterative scans, hnswutils.c:936-971).  Returned as the last element
    when given.

    ``packed`` — optional ``(nbr_vals, qs_p)`` adjacency-packed neighbor
    values ``nbr_vals[cap, 2m, D']`` plus the query representation to
    score them against: each expanded node's whole neighbor value block
    is one contiguous slab, so the hop gathers Q·expand slabs instead of
    Q·expand·2m random rows.  The per-hop score gather is the measured
    single-chip floor (~20 ns/row at 1M, row-count-bound —
    BENCH_NOTES.md); slab packing cuts gathered rows 2m-fold at the cost
    of a duplicated value copy (bf16 keeps it ≤8 GB at 1M×128-d, with an
    exact f32 re-rank of the final pool restoring exact ordering).
    ``qs_p`` is normally the query batch itself; for large dims the cache
    may hold *sketched* (randomly projected D→D') values, and ``qs_p``
    is then the same projection of the queries (hnsw.py:_sketch_dim)."""
    nq = pool_d.shape[0]
    # a beam wider than the pool can't select more than the pool holds —
    # clamp so expand > ef degrades to expand == ef instead of a top_k
    # shape error (hit by latency-tuned expand=40 at small ef_search)
    expand = min(expand, pool_d.shape[1])
    cand_mask = (~pool_x) & (pool_i >= 0)
    cand_d = jnp.where(cand_mask, pool_d, jnp.inf)
    worst = pool_d[:, ef - 1]
    if expand == 1:
        rows_q = jnp.arange(nq, dtype=jnp.int32)
        sel = jnp.argmin(cand_d, axis=1)
        sel_d = jnp.take_along_axis(cand_d, sel[:, None], axis=1)[:, 0]
        # done: no unexpanded candidate, or best unexpanded is worse than a
        # full pool's worst (the W-bound termination of Algorithm 2)
        done = jnp.isinf(sel_d) | (sel_d > worst)
        pool_x = pool_x.at[rows_q, sel].set(
            jnp.where(done, pool_x[rows_q, sel], True))
        sel_elem = jnp.where(done, -1, pool_i[rows_q, sel])[:, None]  # (Q, 1)
    else:
        neg, sel = jax.lax.top_k(-cand_d, expand)  # (Q, E) best unexpanded
        sel_d = -neg
        done = jnp.isinf(sel_d[:, 0]) | (sel_d[:, 0] > worst)
        # expand entries that are real candidates and not past the bound
        ok = jnp.isfinite(sel_d) & (sel_d <= worst[:, None]) & ~done[:, None]
        rows_q = jnp.broadcast_to(
            jnp.arange(nq, dtype=jnp.int32)[:, None], sel.shape)
        pool_x = pool_x.at[rows_q.reshape(-1), sel.reshape(-1)].max(ok.reshape(-1))
        sel_elem = jnp.where(ok, jnp.take_along_axis(pool_i, sel, axis=1), -1)
    # gather all selected candidates' neighbors in ONE flattened gather:
    # (Q·E,) ids → (Q·E, lm) → (Q, E·lm) (E separate gathers measured ~3×
    # slower at E=4 on v5e)
    sel_flat = sel_elem.reshape(-1)
    nb = neighbors_of(sel_flat)
    nb = jnp.where(sel_flat[:, None] >= 0, nb, -1)
    nbrs = nb.reshape(nq, -1)
    if packed is not None:
        # ---- packed-adjacency scoring path ----
        if len(packed) == 4:
            nbr_vals, qs_p, pscale, pnorm2 = packed
        else:
            nbr_vals, qs_p = packed[:2]
            pscale = pnorm2 = None
        w = nbrs.shape[1]
        pv = nbr_vals[jnp.maximum(sel_flat, 0)]  # (Q·E, lm, D) slab gather
        v = pv.reshape(nq, w, pv.shape[-1])
        if pallas_tail and disc is None and vmode == "off":
            # fused VMEM tail: dedup + in-pool + merge in one kernel
            # (bit-identical to the unfused path — pallas_hop docstring)
            from ..ops import pallas_hop

            nd = (_int8_point_scores(metric, qs_p, pscale, pnorm2, v, nbrs)
                  if pscale is not None
                  else dense_point_scores(metric, qs_p, v, nbrs))
            pool_packed = pool_i * 2 + pool_x.astype(jnp.int32)
            d, pp = pallas_hop.hop_tail(pool_d, pool_packed, nd, nbrs,
                                        ef, w)
            return d, pp >> 1, (pp & 1) == 1, visited, done
        # dup mask in adjacency order (values must stay position-aligned,
        # so no dedup re-sort): mark later copies of an id via a strict
        # lower-triangle compare block
        if sel_elem.shape[1] > 1:
            eqm = nbrs[:, :, None] == nbrs[:, None, :]
            tri = (jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
                   > jax.lax.broadcasted_iota(jnp.int32, (w, w), 1))
            dup = jnp.any(eqm & tri[None] & (nbrs >= 0)[:, None, :], axis=2)
            nbrs = jnp.where(dup, -1, nbrs)
        in_pool = jnp.any(nbrs[:, :, None] == pool_i[:, None, :], axis=2)
        nbrs = jnp.where(in_pool, -1, nbrs)
        visited, seen = visited_probe(visited, nbrs, vmode)
        nbrs = jnp.where(seen, -1, nbrs)
        nd = (_int8_point_scores(metric, qs_p, pscale, pnorm2, v, nbrs)
              if pscale is not None
              else dense_point_scores(metric, qs_p, v, nbrs))
        if prune and prune < nbrs.shape[1]:
            # hybrid two-level hop (sketched caches): the JL-distorted slab
            # scores only PRUNE the hop's w candidates to the top ``prune``;
            # those are re-scored exactly via row gathers before pool
            # admission, so the pool holds true distances (sketch-only
            # admission collapsed GIST-1M ef=40 recall to 0.42).  Gathered
            # rows drop w→prune vs the plain row-gather path; candidates
            # pruned away are already marked visited and stay lost — the
            # recall trade is bounded by the within-hop top-``prune``
            # quality of the sketch, far gentler than pool-wide JL ordering.
            _, selc = jax.lax.top_k(-nd, prune)
            nbrs = jnp.take_along_axis(nbrs, selc, axis=1)
            nd = score(qs, nbrs)
            nd = jnp.where(nbrs >= 0, nd, jnp.inf)
        return _hop_merge(pool_d, pool_i, pool_x, nbrs, nd, visited, ef,
                          disc, done)
    # dedupe within the hop (two expanded nodes sharing a neighbor):
    # sort by a BIJECTIVE multiplicative permutation of the id (Knuth
    # hash; odd multiplier mod 2^32 — exact dedup via adjacency since
    # permuted-key equality ⇔ id equality) and mask adjacent equals —
    # O(W log W) instead of the (W, W) compare block (0.7 vs 1.4 ms at
    # W=256 on v5e).  The permuted order is also *unbiased*, which makes
    # the truncation below safe: plain id order biased the drop toward
    # late-inserted elements and collapsed recall 0.999 → 0.77.
    if sel_elem.shape[1] > 1:
        perm = jnp.uint32(2654435761)   # Knuth multiplicative constant
        perm_inv = jnp.uint32(244002641)  # modular inverse mod 2^32
        inval = jnp.uint32(0xFFFFFFFF)  # no id < 2^30 maps here
        key = jnp.where(nbrs >= 0, nbrs.astype(jnp.uint32) * perm, inval)
        key = jax.lax.sort(key, dimension=1)
        dup = jnp.concatenate(
            [jnp.zeros((nq, 1), jnp.bool_),
             (key[:, 1:] == key[:, :-1]) & (key[:, 1:] != inval)], axis=1)
        ids = (key * perm_inv).astype(jnp.int32)
        nbrs = jnp.where(dup | (key == inval), -1, ids)
        # NOTE: truncating to 3W/4 after this sort was tried twice to cut
        # the dominant gather and REJECTED both times: id-order drops are
        # biased toward late inserts (recall 0.999→0.77) and even the
        # unbiased permuted-order drop lost 5 recall points AND increased
        # hop counts (0.9483 @ 20 hops vs 0.9990 @ 16 at 100k/ef40/e8) —
        # most hops have no duplicate margin to spend.
    # pool-membership check: keeps the ef pool duplicate-free even when a
    # visited-table insert failed (hash-set load spill → benign revisit)
    in_pool = jnp.any(nbrs[:, :, None] == pool_i[:, None, :], axis=2)
    nbrs = jnp.where(in_pool, -1, nbrs)
    visited, seen = visited_probe(visited, nbrs, vmode)
    nbrs = jnp.where(seen, -1, nbrs)
    nd = score(qs, nbrs)
    return _hop_merge(pool_d, pool_i, pool_x, nbrs, nd, visited, ef, disc,
                      done)


def _hop_merge(pool_d, pool_i, pool_x, nbrs, nd, visited, ef: int, disc,
               done):
    """Shared hop tail: merge scored candidates into the ef pool (and the
    discarded pool for iterative scans)."""
    d = jnp.concatenate([pool_d, nd], axis=1)
    # pack (id, expanded-flag) into one int32 — id·2 | x — so the pool
    # merge is a 2-operand sort instead of 3 (measured 0.65 vs 0.91 ms at
    # (1000, 168) on v5e).  Ids are bounded by the 2^30 element-capacity
    # this implies; -1 padding packs to -2 and unpacks back via the
    # arithmetic shift.
    packed = jnp.concatenate(
        [pool_i * 2 + pool_x.astype(jnp.int32), nbrs * 2], axis=1)
    d, packed = jax.lax.sort((d, packed), num_keys=1)
    i = packed >> 1
    x = (packed & 1) == 1
    if disc is not None:
        # candidates evicted past the ef bound feed the discarded pool
        # (hnswutils.c:936-971); -1/inf padding sorts to the tail
        disc_d, disc_i = disc
        dk = disc_d.shape[1]
        dd = jnp.concatenate([disc_d, d[:, ef:]], axis=1)
        di = jnp.concatenate([disc_i, i[:, ef:]], axis=1)
        dd, di = jax.lax.sort((dd, di), num_keys=1)
        disc = (dd[:, :dk], di[:, :dk])
        # per-query scored-candidate count: the reference bumps so->tuples
        # for every tuple whose distance is computed inside HnswSearchLayer,
        # which is what hnsw.max_scan_tuples meters (hnswscan.c:255-266)
        scored = jnp.sum((nbrs >= 0).astype(jnp.int32), axis=1)
        return (d[:, :ef], i[:, :ef], x[:, :ef], visited, disc, done, scored)
    return d[:, :ef], i[:, :ef], x[:, :ef], visited, done


@functools.partial(jax.jit, static_argnames=("kind", "metric", "ef", "expand",
                                             "vmode", "sdim"))
def _hop_step(kind, metric, values, nbr0, nbr_up, up_slot, level, qs,
              pool_d, pool_i, pool_x, visited, ef: int, expand: int = 1,
              vmode: str = "hash2", sdim: int = 0):
    score = make_scorer(kind, metric, values, sdim)
    nbrs_of = _neighbors_closure(nbr0, nbr_up, up_slot)
    return _hop_body(score, lambda e: nbrs_of(e, level), qs,
                     pool_d, pool_i, pool_x, visited, ef, expand, vmode=vmode)


def _init_pool(qs, init_d, init_i, ef: int):
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
    return pool_d, pool_i, pool_x


def search_layer(score, neighbors_of, qs, init_d, init_i, visited,
                 ef: int, max_steps: int, expand: int = 1,
                 disc=None, vmode: str = "hash2", packed=None, metric=None,
                 pallas_tail: bool = False, prune: int = 0):
    """Algorithm 2 (HnswSearchLayer, hnswutils.c:822-985), batched, as a
    traced while_loop — for use inside the TPU mono-jits.

    With ``disc`` (a (disc_d, disc_i) pair), evicted candidates accumulate
    into the discarded pool and the return is
    (pool_d, pool_i, visited, disc, steps); without it,
    (pool_d, pool_i, visited, steps)."""
    pool_d, pool_i, pool_x = _init_pool(qs, init_d, init_i, ef)
    visited, _ = visited_probe(visited, pool_i, vmode)
    nq = pool_d.shape[0]

    def cond(state):
        step, done = state[-2], state[-1]
        return jnp.logical_and(~jnp.all(done), step < max_steps)

    if disc is not None:
        def cond_disc(state):
            step, done = state[-3], state[-2]
            return jnp.logical_and(~jnp.all(done), step < max_steps)

        def body(state):
            pool_d, pool_i, pool_x, visited, dd, di, step, _, sc = state
            pool_d, pool_i, pool_x, visited, (dd, di), done, scored = \
                _hop_body(
                    score, neighbors_of, qs, pool_d, pool_i, pool_x, visited,
                    ef, expand, disc=(dd, di), vmode=vmode, packed=packed,
                    metric=metric, pallas_tail=pallas_tail, prune=prune,
                )
            return (pool_d, pool_i, pool_x, visited, dd, di, step + 1, done,
                    sc + scored)

        state = (pool_d, pool_i, pool_x, visited, disc[0], disc[1],
                 jnp.int32(0), jnp.zeros((nq,), jnp.bool_),
                 jnp.zeros((nq,), jnp.int32))
        (pool_d, pool_i, pool_x, visited, dd, di, steps, _, scanned) = \
            jax.lax.while_loop(cond_disc, body, state)
        return pool_d, pool_i, visited, (dd, di), steps, scanned

    def body(state):
        pool_d, pool_i, pool_x, visited, step, _ = state
        pool_d, pool_i, pool_x, visited, done = _hop_body(
            score, neighbors_of, qs, pool_d, pool_i, pool_x, visited, ef,
            expand, vmode=vmode, packed=packed, metric=metric,
            pallas_tail=pallas_tail, prune=prune,
        )
        return pool_d, pool_i, pool_x, visited, step + 1, done

    state = (pool_d, pool_i, pool_x, visited, jnp.int32(0),
             jnp.zeros((nq,), jnp.bool_))
    pool_d, pool_i, pool_x, visited, steps, _ = \
        jax.lax.while_loop(cond, body, state)
    return pool_d, pool_i, visited, steps


@functools.partial(jax.jit, static_argnames=("ef", "vmode"))
def _pool_seed(qs, init_d, init_i, visited, ef: int, vmode: str = "hash2"):
    pool_d, pool_i, pool_x = _init_pool(qs, init_d, init_i, ef)
    visited, _ = visited_probe(visited, pool_i, vmode)
    return pool_d, pool_i, pool_x, visited


def search_layer_host(kind, metric, values, nbr0, nbr_up, up_slot, level,
                      qs, init_d, init_i, visited, ef: int, max_steps: int,
                      expand: int = 1, vmode: str = "hash2", sdim: int = 0):
    """Host-driven Algorithm 2: the same hop step, with termination checked
    on the host (CPU backend path)."""
    pool_d, pool_i, pool_x, visited = _pool_seed(qs, init_d, init_i, visited,
                                                 ef, vmode)
    lvl = jnp.int32(level)
    steps = 0
    for _ in range(max_steps):
        pool_d, pool_i, pool_x, visited, done = _hop_step(
            kind, metric, values, nbr0, nbr_up, up_slot, lvl, qs,
            pool_d, pool_i, pool_x, visited, ef, expand, vmode, sdim
        )
        steps += 1
        if bool(jnp.all(done)):
            break
    return pool_d, pool_i, visited, jnp.int32(steps)


# ---------------------------------------------------------------------------
# greedy ef=1 descent (upper levels)
# ---------------------------------------------------------------------------


def _greedy_body(score, neighbors_of, qs, cur, cur_d):
    nbrs = neighbors_of(cur)
    nd = score(qs, nbrs)
    best = jnp.argmin(nd, axis=1)
    best_d = jnp.take_along_axis(nd, best[:, None], axis=1)[:, 0]
    best_i = jnp.take_along_axis(nbrs, best[:, None], axis=1)[:, 0]
    move = best_d < cur_d
    return (jnp.where(move, best_i, cur), jnp.where(move, best_d, cur_d), move)


def greedy_descent(score, neighbors_of_level, qs, start, start_d, level, m,
                   max_steps: int):
    """ef=1 greedy walk on one upper level (hnswutils.c:1293-1306), traced."""

    def cond(state):
        _, _, moved, step = state
        return jnp.logical_and(jnp.any(moved), step < max_steps)

    def body(state):
        cur, cur_d, _, step = state
        cur, cur_d, move = _greedy_body(
            score, lambda e: neighbors_of_level(e, level), qs, cur, cur_d
        )
        return cur, cur_d, move, step + 1

    nq = start.shape[0]
    state = (start, start_d, jnp.ones((nq,), jnp.bool_), jnp.int32(0))
    cur, cur_d, _, _ = jax.lax.while_loop(cond, body, state)
    return cur, cur_d


@functools.partial(jax.jit, static_argnames=("kind", "metric", "sdim"))
def _greedy_step(kind, metric, values, nbr0, nbr_up, up_slot, level, qs, cur,
                 cur_d, sdim: int = 0):
    score = make_scorer(kind, metric, values, sdim)
    nbrs_of = _neighbors_closure(nbr0, nbr_up, up_slot)
    return _greedy_body(score, lambda e: nbrs_of(e, level), qs, cur, cur_d)


def greedy_descent_host(kind, metric, values, nbr0, nbr_up, up_slot, level,
                        qs, cur, cur_d, max_steps: int, sdim: int = 0):
    lvl = jnp.int32(level)
    for _ in range(max_steps):
        cur, cur_d, moved = _greedy_step(
            kind, metric, values, nbr0, nbr_up, up_slot, lvl, qs, cur, cur_d,
            sdim
        )
        if not bool(jnp.any(moved)):
            break
    return cur, cur_d


@functools.partial(jax.jit, static_argnames=("k",))
def merge_scan_batches(all_d, all_r, k: int):
    """Device-side iterative-scan merge: one call over the whole
    (nq, batches·ef) emission matrix replaces the per-query host
    np.unique + argsort loop that throttled 4k-query batches.

    Duplicate emissions of one element across resume batches carry
    identical distances (suppressed entries arrive as row −1), so
    keep-first dedup == keep-any: stable-sort by row id, mask repeats to
    inf, stable-sort by distance, slice k.  Two ``lax.sort`` calls with
    carried operands — deliberately no gather/take_along_axis, which
    miscompiles behind top_k on this image's axon toolchain (see
    _row_gather).  Tie-break matches the host merge: equal distances emit
    in ascending row order."""
    d = jnp.where(all_r < 0, jnp.inf, all_d)
    sr, sd = jax.lax.sort((all_r, d), dimension=1, num_keys=1, is_stable=True)
    dup = jnp.concatenate(
        [jnp.zeros_like(sr[:, :1], jnp.bool_), sr[:, 1:] == sr[:, :-1]],
        axis=1)
    sd = jnp.where(dup, jnp.inf, sd)
    sd2, sr2 = jax.lax.sort((sd, sr), dimension=1, num_keys=1, is_stable=True)
    out_d = sd2[:, :k]
    out_r = jnp.where(jnp.isinf(out_d), -1, sr2[:, :k])
    return out_d, out_r


# ---------------------------------------------------------------------------
# SelectNeighbors heuristic (Algorithm 4 — hnswutils.c:1062-1163)
# ---------------------------------------------------------------------------


def _row_gather(mat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-row gather mat[q, idx[q, j]] WITHOUT a gather op.

    Both ``jnp.take_along_axis(mat, idx, axis=1)`` and the flattened 1-D
    gather MISCOMPILE on this image's axon TPU toolchain when fused behind
    ``top_k`` inside the select kernels (observed at (1024, 80) int32
    pools: the compiled program returned the *indices* instead of the
    gathered values, silently corrupting every neighbor list and halving
    build recall — BENCH_NOTES.md).  The raw gathers are correct in
    isolation, so this is a fusion-context bug; the one-hot select below
    avoids gather entirely (O(K·W) VPU compares — negligible next to the
    pairwise matmul) and an optimization barrier pins the index operand."""
    idx = jax.lax.optimization_barrier(idx)
    col = jnp.arange(mat.shape[1], dtype=jnp.int32)
    hit = col[None, None, :] == idx[:, :, None]  # (Q, K, W)
    return jnp.sum(jnp.where(hit, mat[:, None, :], 0), axis=2)


def select_neighbors(base_d, pair_d, valid, lm: int, forced=None):
    """Algorithm 4: returns ((lm,) selected candidate *positions*
    (-1 padded), (lm,) kept flags) — heuristic-kept first, then
    closest-pruned backfill (keepPrunedConnections, hnswutils.c:1133-1156).

    ``forced`` marks candidates whose kept status is STICKY: they seed the
    kept set and prune via pair distances before the loop runs.  This is
    the reference's ``closer`` caching (hnswutils.c:1094-1131 reuses each
    incumbent's cached closer flag across update selects): once a member
    is admitted as heuristic-kept it stays protected, and later updates
    only compete for the backfill slots.  Without it, re-selecting a list
    from scratch under a non-metric ordering (inner product) lets a few
    global high-norm hubs dominate every list — measured on 10k uniform
    3-d IP data: 92% of elements become unreachable and build recall caps
    at 0.86 vs the reference's 0.97 floor."""
    c = base_d.shape[0]
    big_d = jnp.where(valid, base_d, jnp.inf)
    if forced is None:
        forced = jnp.zeros((c,), jnp.bool_)
    forced = forced & valid & jnp.isfinite(big_d)
    order = jnp.argsort(big_d)  # closest-first processing
    # sticky members skip the min-pair re-check (their kept status is
    # cached), but they still compete for the lm slots in distance order —
    # a far sticky member CAN rotate out when closer candidates fill the
    # cap first (the reference's r-cap applies in pop order regardless of
    # cached flags, hnswutils.c:1088-1156).  This distance-ordered cap is
    # what prevents early lists from freezing solid.

    def body(t, state):
        kept_count, kept, min_pair = state
        i = order[t]
        ok = (
            (forced[i] | (big_d[i] < min_pair[i]))
            & (kept_count < lm)
            & jnp.isfinite(big_d[i])
        )
        kept = kept.at[i].set(ok)
        min_pair = jnp.where(ok, jnp.minimum(min_pair, pair_d[:, i]), min_pair)
        return kept_count + ok.astype(jnp.int32), kept, min_pair

    kept_count, kept, _ = jax.lax.fori_loop(
        0, c, body,
        (jnp.int32(0), jnp.zeros((c,), jnp.bool_), jnp.full((c,), jnp.inf)),
    )
    rank = jnp.where(kept, big_d, jnp.where(jnp.isfinite(big_d), big_d + BIG, jnp.inf))
    neg, pos = jax.lax.top_k(-rank, lm)
    pos = jnp.where(jnp.isinf(-neg), -1, pos)
    kept_sel = kept[jnp.maximum(pos, 0)] & (pos >= 0)
    return pos, kept_sel


select_neighbors_batch = jax.vmap(
    select_neighbors, in_axes=(0, 0, 0, None, 0)
)


def _lane_mult() -> int:
    """Select-lane padding multiple on TPU.  128 is the only width this
    image's toolchain compiles correctly in the FUSED kernels: width 80
    miscompiled in round 1, and width 64 — although bit-exact vs the CPU
    reference on isolated random rows — degraded 4k build recall
    0.97 → 0.8665 inside connect_level (fusion-context miscompile,
    round 2).  PGVECTOR_TPU_LANE_MULT=64 re-enables the experiment."""
    import os

    return int(os.environ.get("PGVECTOR_TPU_LANE_MULT", 128))


def _pad_lanes(pool_d, pool_i, mult: int = 0):
    """Pad the candidate (lane) dimension to a lane-safe multiple.

    This image's axon TPU toolchain MISCOMPILES the vmapped selection loop
    at some candidate widths: with an 80-wide pool the compiled program
    behaved as if columns 64..79 didn't exist (verified bit-exact at width
    128, wrong at width 80, on identical inputs — BENCH_NOTES.md).
    Padding costs a larger pairwise block but guarantees lane-aligned
    shapes everywhere the select loop runs.  CPU lowering is correct at any
    width, so the pad only applies on TPU backends."""
    if jax.default_backend() != "tpu":
        return pool_d, pool_i
    if not mult:
        mult = _lane_mult()
    c = pool_i.shape[1]
    pad = (-c) % mult
    if pad:
        q = pool_i.shape[0]
        pool_d = jnp.concatenate(
            [pool_d, jnp.full((q, pad), jnp.inf, pool_d.dtype)], axis=1)
        pool_i = jnp.concatenate(
            [pool_i, jnp.full((q, pad), -1, pool_i.dtype)], axis=1)
    return pool_d, pool_i


def _pairwise_dists(kind: str, metric: Metric, values, elems, sdim: int = 0):
    """(T, C, C) stored distances among candidate elements per row.

    Dense L2/IP/cos ride one batched matmul (MXU); other metrics use a
    broadcast block — callers chunk T to bound the (T, C, C, D) tensor.

    ``sdim > 0`` (sparse L2/IP/cos only) selects the *densified* pairwise
    path: each candidate's CSR row is scattered into a dense (sdim,) lane
    and the (C, C) block comes from one batched MXU matmul plus norm
    corrections — numerically the same overlap-IP reduction as the
    merge-join scorer (zeros contribute nothing to the sum), but the
    transients are (T, C, sdim) f32 instead of the (T, C, C, nnz_lanes)
    searchsorted gather temps that forced 16-row waves at nnz 32
    (hnsw.py:_sparse_pair_rows_cap).  Callers enable it when
    sdim·4 < C·nnz_lanes·8 (moderate logical dims)."""
    safe = jnp.maximum(elems, 0)
    ok = (elems[:, :, None] >= 0) & (elems[:, None, :] >= 0)
    if kind == "dense" and metric in (Metric.L2, Metric.IP, Metric.COSINE):
        v = values[0][safe].astype(jnp.float32)  # (T, C, D)
        ip = jax.lax.dot_general(
            v, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # f32-exact like the scorers
        )  # (T, C, C)
        if metric is Metric.L2:
            sq = jnp.sum(v * v, axis=-1)
            d = jnp.maximum(sq[:, :, None] - 2.0 * ip + sq[:, None, :], 0.0)
        else:
            d = -ip
        return jnp.where(ok, d, jnp.inf)
    if kind == "dense":  # L1
        v = values[0][safe].astype(jnp.float32)
        d = jnp.sum(jnp.abs(v[:, :, None, :] - v[:, None, :, :]), axis=-1)
        return jnp.where(ok, d, jnp.inf)
    if kind == "bit":
        w = values[0][safe]  # (T, C, W)
        if metric is Metric.HAMMING:
            d = jnp.sum(
                jax.lax.population_count(
                    jnp.bitwise_xor(w[:, :, None, :], w[:, None, :, :])
                ).astype(jnp.int32),
                axis=-1,
            ).astype(jnp.float32)
        else:
            ab = jnp.sum(
                jax.lax.population_count(
                    jnp.bitwise_and(w[:, :, None, :], w[:, None, :, :])
                ).astype(jnp.int32),
                axis=-1,
            ).astype(jnp.float32)
            pop = jnp.sum(
                jax.lax.population_count(w).astype(jnp.int32), axis=-1
            ).astype(jnp.float32)
            denom = pop[:, :, None] + pop[:, None, :] - ab
            d = jnp.where(ab == 0, 1.0, 1.0 - ab / jnp.where(denom > 0, denom, 1.0))
        return jnp.where(ok, d, jnp.inf)
    idx_arr, val_arr = values
    ridx = idx_arr[safe]  # (T, C, P)
    rval = val_arr[safe]
    if sdim > 0 and metric in (Metric.L2, Metric.IP, Metric.COSINE):
        t, c, p = ridx.shape
        # scatter-densify: pad entries (SPARSE_PAD, val 0) land in an
        # overflow column that's sliced off; indices are distinct per row
        # so add == set
        col = jnp.minimum(ridx.reshape(t * c, p), sdim).astype(jnp.int32)
        rows = jnp.arange(t * c, dtype=jnp.int32)[:, None]
        v = (jnp.zeros((t * c, sdim + 1), jnp.float32)
             .at[rows, col].add(rval.reshape(t * c, p))
             [:, :sdim].reshape(t, c, sdim))
        ip = jax.lax.dot_general(
            v, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (T, C, C)
        if metric is Metric.IP:
            d = -ip
        else:
            sq = jnp.sum(rval * rval, axis=-1)  # pads contribute 0
            if metric is Metric.L2:
                d = jnp.maximum(sq[:, :, None] - 2.0 * ip + sq[:, None, :], 0.0)
            else:
                denom = jnp.sqrt(sq[:, :, None] * sq[:, None, :])
                cos = jnp.where(denom > 0,
                                ip / jnp.where(denom > 0, denom, 1.0),
                                -jnp.inf)
                d = 1.0 - cos
        return jnp.where(ok, d, jnp.inf)
    # merge-join fallback (L1, or huge logical dims): vmapped single-query
    # scorer per row (nested vmap, no lax loop)

    def pair_rows(ri, rv):
        return jax.vmap(lambda qi, qv: D.sparse_scores(metric, qi, qv, ri, rv))(ri, rv)

    d = jax.vmap(pair_rows)(ridx, rval)
    return jnp.where(ok, d, jnp.inf)


@functools.partial(jax.jit, static_argnames=("kind", "metric", "lm", "sdim"))
def select_connections(kind, metric, values, base_elems, pool_d, pool_i,
                       lm: int, sdim: int = 0):
    """SelectNeighbors over each base element's candidate pool →
    ((Q, lm) neighbor element ids, (Q, lm) heuristic-kept flags)."""
    pool_d, pool_i = _pad_lanes(pool_d, pool_i)
    pair = _pairwise_dists(kind, metric, values, pool_i, sdim)
    forced = jnp.zeros(pool_i.shape, jnp.bool_)
    pos, kept = select_neighbors_batch(pool_d, pair, pool_i >= 0, lm, forced)
    sel = _row_gather(pool_i, jnp.maximum(pos, 0))
    return jnp.where(pos >= 0, sel, -1), kept & (pos >= 0)


def _merge_wholesale_core(kind, metric, values, old_lists, old_kept,
                          new_src, targets, lm: int, sdim: int = 0):
    """One SelectNeighbors over old ∪ new per target — a single select per
    wave instead of the reference's per-source fold (~8× cheaper during
    builds).  ``old_kept`` marks the incumbents whose heuristic-kept
    status is sticky (the reference's cached ``closer`` flags,
    hnswutils.c:1094-1131): they stay admitted, so repeated updates only
    rotate the backfill slots.  Returns (new lists, new kept flags)."""
    score = make_scorer(kind, metric, values, sdim)
    cand = jnp.concatenate([old_lists, new_src], axis=1)
    forced = jnp.concatenate(
        [old_kept & (old_lists >= 0),
         jnp.zeros(new_src.shape, jnp.bool_)], axis=1)
    c = cand.shape[1]
    eq = cand[:, :, None] == cand[:, None, :]
    idx = jnp.arange(c)
    earlier = idx[None, :, None] > idx[None, None, :]
    dup = jnp.any(eq & earlier & (cand[:, :, None] >= 0), axis=2)
    cand = jnp.where(dup, -1, cand)
    forced = forced & (cand >= 0)
    t_rep = elems_as_queries(kind, values, targets)
    base_d = score(t_rep, cand)
    base_d = jnp.where(targets[:, None] >= 0, base_d, jnp.inf)
    base_d, cand = _pad_lanes(base_d, cand)
    if forced.shape[1] != cand.shape[1]:
        forced = jnp.concatenate(
            [forced, jnp.zeros(
                (forced.shape[0], cand.shape[1] - forced.shape[1]),
                jnp.bool_)], axis=1)
    pair = _pairwise_dists(kind, metric, values, cand, sdim)
    pos, kept = select_neighbors_batch(base_d, pair, cand >= 0, lm, forced)
    sel = _row_gather(cand, jnp.maximum(pos, 0))
    return jnp.where(pos >= 0, sel, -1), kept & (pos >= 0)


@functools.partial(jax.jit, static_argnames=("kind", "metric", "lm", "sdim"))
def merge_backlinks_wholesale(kind, metric, values, old_lists, old_kept,
                              new_src, targets, lm: int, sdim: int = 0):
    return _merge_wholesale_core(kind, metric, values, old_lists, old_kept,
                                 new_src, targets, lm, sdim)


@functools.partial(jax.jit, static_argnames=("kind", "metric", "lm", "sdim"))
def merge_backlinks(kind, metric, values, old_lists, old_kept, new_src,
                    targets, lm: int, sdim: int = 0):
    """HnswUpdateConnection batched by target (hnswutils.c:1181-1229),
    with the reference's *incremental* semantics: each new source is folded
    one at a time — appended while the list has room, else one select over
    the lm+1 candidates with the incumbents' sticky kept flags as the
    forced set (the cached ``closer`` reuse, hnswutils.c:1094-1131), so
    exactly one unprotected slot turns over per source.

    Returns ((T, lm) updated lists, (T, lm) kept flags).  The per-source
    loop unrolls over new_src's (static) width."""
    score = make_scorer(kind, metric, values, sdim)
    t_rep = elems_as_queries(kind, values, targets)
    t = old_lists.shape[0]
    rows = jnp.arange(t, dtype=jnp.int32)
    cur = old_lists
    curk = old_kept & (old_lists >= 0)
    for j in range(new_src.shape[1]):
        s = new_src[:, j]  # (T,)
        skip = (s < 0) | (targets < 0) | jnp.any(cur == s[:, None], axis=1)
        n_valid = jnp.sum((cur >= 0).astype(jnp.int32), axis=1)
        # append path: put s into the first free slot (flag stays False —
        # appended members are backfill-class until a select admits them)
        has_free = n_valid < lm
        first_free = jnp.argmax(cur < 0, axis=1)
        appended = cur.at[rows, first_free].set(
            jnp.where(has_free & ~skip, s, cur[rows, first_free])
        )
        # replace path: select lm of the lm+1 candidates; sticky incumbents
        # are forced-kept, so the turnover happens in the backfill slots
        cand = jnp.concatenate([cur, s[:, None]], axis=1)  # (T, lm+1)
        forced = jnp.concatenate(
            [curk, jnp.zeros((t, 1), jnp.bool_)], axis=1)
        base_d = score(t_rep, cand)
        base_d = jnp.where(targets[:, None] >= 0, base_d, jnp.inf)
        base_d, cand = _pad_lanes(base_d, cand)
        if forced.shape[1] != cand.shape[1]:
            forced = jnp.concatenate(
                [forced, jnp.zeros(
                    (t, cand.shape[1] - forced.shape[1]), jnp.bool_)], axis=1)
        pair = _pairwise_dists(kind, metric, values, cand, sdim)
        pos, kept = select_neighbors_batch(base_d, pair, cand >= 0, lm, forced)
        sel = _row_gather(cand, jnp.maximum(pos, 0))
        pruned_list = jnp.where(pos >= 0, sel, -1)
        pruned_kept = kept & (pos >= 0)
        cur = jnp.where(
            skip[:, None], cur,
            jnp.where(has_free[:, None], appended, pruned_list),
        )
        curk = jnp.where(
            skip[:, None], curk,
            jnp.where(has_free[:, None], curk, pruned_kept),
        )
    return cur, curk


def _group_edges(tgt, src, d, smax: int):
    """Group an (E,) edge list by target, on device.

    Returns (targets (E,), new_src (E, smax), u_count): row r < u_count of
    ``new_src`` holds the up-to-``smax`` nearest sources pointing at
    ``targets[r]`` (rows past u_count are -1).  Sources beyond smax per
    target are dropped — nearest-first ordering makes the dropped ones the
    farthest, which the wholesale select would prune anyway.  This is the
    device replacement for round 1's host np.unique group-by (one sort +
    segmented scans instead of a device→host sync per wave)."""
    e = tgt.shape[0]
    inval = jnp.int32(2**31 - 1)
    key_t = jnp.where((tgt >= 0) & (src >= 0), tgt, inval)
    st, sd, ss = jax.lax.sort((key_t, d, src), num_keys=2)
    valid = st != inval
    newrun = jnp.concatenate([valid[:1], (st[1:] != st[:-1]) & valid[1:]])
    run_id = jnp.cumsum(newrun.astype(jnp.int32)) - 1
    idx = jnp.arange(e, dtype=jnp.int32)
    start = jax.lax.cummax(jnp.where(newrun, idx, 0))
    pos = idx - start
    keep = valid & (pos < smax)
    new_src = jnp.full((e, smax), -1, jnp.int32).at[
        jnp.where(keep, run_id, e), jnp.where(keep, pos, 0)
    ].set(ss, mode="drop")
    targets = jnp.full((e,), -1, jnp.int32).at[
        jnp.where(newrun, run_id, e)
    ].set(st, mode="drop")
    u_count = jnp.where(jnp.any(valid), run_id[-1] + 1, 0)
    return targets, new_src, u_count


def _intra_core(kind, metric, values, elems, eligible, mi: int,
                sdim: int = 0):
    """Shared body of intra_wave_candidates/_intra_block: top-mi nearest
    eligible wave-mates per wave member from one (B, B) distance block."""
    d = _pairwise_dists(kind, metric, values, elems[None, :], sdim)[0]  # (B, B)
    b = d.shape[0]
    eye = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    d = jnp.where(eye | ~eligible[None, :], jnp.inf, d)
    neg, pos = jax.lax.top_k(-d, mi)
    ids = jnp.where(jnp.isinf(-neg), -1, elems[pos])
    return jnp.where(ids >= 0, -neg, jnp.inf), ids


def _intra_block(kind, metric, values, elems, eligible, mi: int,
                 sdim: int = 0):
    """Top-mi nearest eligible wave-mates per wave member (see
    intra_wave_candidates) — inline, for use inside connect_level; also
    blanks the rows of ineligible members."""
    d, ids = _intra_core(kind, metric, values, elems, eligible, mi, sdim)
    ids = jnp.where(eligible[:, None], ids, -1)
    return jnp.where(ids >= 0, d, jnp.inf), ids


@functools.partial(
    jax.jit,
    static_argnames=("kind", "metric", "level0", "m", "mi", "smax", "chunk",
                     "sdim"),
    donate_argnames=("nbr0", "nbr_up", "kept0", "kept_up"),
)
def connect_level(kind, metric, values, nbr0, nbr_up, kept0, kept_up,
                  up_slot, elems, eligible, level, pool_d, pool_i,
                  level0: bool, m: int, mi: int, smax: int, chunk: int,
                  sdim: int = 0):
    """One fused connect pass for one level of an insert wave: intra-wave
    candidates + SelectNeighbors per wave member + own-list writes +
    device-grouped backlink merges — a SINGLE device dispatch where the
    round-1 path made dozens of host round-trips per wave (each one a
    tunnel-latency stall; BENCH_NOTES.md).  ``level`` is traced (one
    compile serves all upper levels); ``level0`` switches the nbr0/nbr_up
    write paths.  Graph arrays are donated: updates happen in place.

    Returns (nbr0, nbr_up, kept0, kept_up) updated."""
    lm = 2 * m if level0 else m
    # 1. blank ineligible rows, fold intra-wave candidates into the pools
    pool_d = jnp.where(eligible[:, None], pool_d, jnp.inf)
    pool_i = jnp.where(eligible[:, None], pool_i, -1)
    if mi > 0:
        intra_d, intra_i = _intra_block(kind, metric, values, elems,
                                        eligible, mi, sdim)
        pool_d = jnp.concatenate([pool_d, intra_d], axis=1)
        pool_i = jnp.concatenate([pool_i, intra_i], axis=1)
    # 2. SelectNeighbors over each member's pool (Algorithm 4)
    pool_d, pool_i = _pad_lanes(pool_d, pool_i)
    pair = _pairwise_dists(kind, metric, values, pool_i, sdim)
    forced0 = jnp.zeros(pool_i.shape, jnp.bool_)
    pos, kept = select_neighbors_batch(pool_d, pair, pool_i >= 0, lm, forced0)
    sel = _row_gather(pool_i, jnp.maximum(pos, 0))
    sel = jnp.where(pos >= 0, sel, -1)
    sel_d = jnp.where(pos >= 0, _row_gather(pool_d, jnp.maximum(pos, 0)),
                      jnp.inf)
    keptf = kept & (pos >= 0)
    # 3. write own lists
    lvl_idx = jnp.maximum(level - 1, 0)
    if level0:
        w = jnp.where(eligible, elems, nbr0.shape[0])
        nbr0 = nbr0.at[w].set(sel, mode="drop")
        kept0 = kept0.at[w].set(keptf, mode="drop")
    else:
        slots = up_slot[jnp.maximum(elems, 0)]
        okw = eligible & (slots >= 0)
        wu = jnp.where(okw, slots, nbr_up.shape[0])
        nbr_up = nbr_up.at[wu, lvl_idx].set(sel, mode="drop")
        kept_up = kept_up.at[wu, lvl_idx].set(keptf, mode="drop")
    # 4. backlinks: group (src → tgt) edges by target on device, then merge
    # chunks of targets with the wholesale select until u_count is covered
    b = elems.shape[0]
    tgt = sel.reshape(-1)
    src = jnp.repeat(jnp.where(eligible, elems, -1), lm)
    d_e = sel_d.reshape(-1)
    targets, new_src, u_count = _group_edges(tgt, src, d_e, smax)
    e_rows = targets.shape[0]
    pad_rows = (-e_rows) % chunk
    if pad_rows:
        targets = jnp.concatenate(
            [targets, jnp.full((pad_rows,), -1, jnp.int32)])
        new_src = jnp.concatenate(
            [new_src, jnp.full((pad_rows, smax), -1, jnp.int32)])

    def cond(state):
        return state[0] * chunk < u_count

    # merged lists accumulate into a dense (E_pad, lm) buffer via
    # contiguous dynamic_update_slice; ONE scatter applies them all after
    # the loop.  Per-chunk scatters measured 1.67ms each on v5e (×2 arrays
    # × ~22 chunks ≈ 73ms/wave) vs 5.5ms for one 32k-row scatter.  Safe
    # because targets are unique across the wave: no chunk reads another
    # chunk's backlink writes (own-list writes land before this loop).
    e_pad_rows = targets.shape[0]
    acc_l = jnp.full((e_pad_rows, lm), -1, jnp.int32)
    acc_k = jnp.zeros((e_pad_rows, lm), jnp.bool_)

    def body(state):
        i, acc_l, acc_k = state
        t_c = jax.lax.dynamic_slice(targets, (i * chunk,), (chunk,))
        s_c = jax.lax.dynamic_slice(new_src, (i * chunk, 0),
                                    (chunk, smax))
        if level0:
            okc = t_c >= 0
            old = jnp.where(okc[:, None], nbr0[jnp.maximum(t_c, 0)], -1)
            oldk = kept0[jnp.maximum(t_c, 0)] & okc[:, None]
        else:
            slots_c = up_slot[jnp.maximum(t_c, 0)]
            okc = (t_c >= 0) & (slots_c >= 0)
            old = jnp.where(okc[:, None],
                            nbr_up[jnp.maximum(slots_c, 0), lvl_idx], -1)
            oldk = kept_up[jnp.maximum(slots_c, 0), lvl_idx] & okc[:, None]
        new_l, new_k = _merge_wholesale_core(
            kind, metric, values, old, oldk, s_c,
            jnp.where(okc, t_c, -1), lm, sdim)
        new_l = jnp.where(okc[:, None], new_l, -1)
        acc_l = jax.lax.dynamic_update_slice(acc_l, new_l, (i * chunk, 0))
        acc_k = jax.lax.dynamic_update_slice(acc_k, new_k & okc[:, None],
                                             (i * chunk, 0))
        return i + 1, acc_l, acc_k

    _, acc_l, acc_k = jax.lax.while_loop(
        cond, body, (jnp.int32(0), acc_l, acc_k))
    # rows past u_count / invalid targets carry tgt=-1 → dropped
    done_rows = (jnp.arange(e_pad_rows, dtype=jnp.int32)
                 < u_count) & (targets >= 0)
    if level0:
        w = jnp.where(done_rows, targets, nbr0.shape[0])
        nbr0 = nbr0.at[w].set(acc_l, mode="drop")
        kept0 = kept0.at[w].set(acc_k, mode="drop")
    else:
        slots_t = up_slot[jnp.maximum(targets, 0)]
        okw2 = done_rows & (slots_t >= 0)
        wu = jnp.where(okw2, slots_t, nbr_up.shape[0])
        nbr_up = nbr_up.at[wu, lvl_idx].set(acc_l, mode="drop")
        kept_up = kept_up.at[wu, lvl_idx].set(acc_k, mode="drop")
    return nbr0, nbr_up, kept0, kept_up


@functools.lru_cache(maxsize=None)
def _connect_sharded_fn(mesh, kind, metric, level0: bool, m: int, mi: int,
                        smax: int, chunk: int, sdim: int):
    """Build (and cache) the jitted shard_map program for
    connect_level_sharded.  ``mesh`` participates in the cache key (Mesh is
    hashable); graph arrays are donated so updates happen in place on every
    replica."""
    import jax.sharding as shd

    ax = mesh.axis_names[0]
    ndev = int(mesh.devices.size)
    lm = 2 * m if level0 else m

    def body(values, nbr0, nbr_up, kept0, kept_up, up_slot, elems, eligible,
             level, pool_d, pool_i):
        didx = jax.lax.axis_index(ax)
        b = elems.shape[0]
        b_loc = b // ndev
        lvl_idx = jnp.maximum(level - 1, 0)
        # 1. blank ineligible rows + fold intra-wave candidates — the (B, B)
        # block is cheap next to the select pairwise, so every device
        # computes it in full (bit-identical to the fused kernel by
        # construction) and then slices its row range
        pool_d = jnp.where(eligible[:, None], pool_d, jnp.inf)
        pool_i = jnp.where(eligible[:, None], pool_i, -1)
        if mi > 0:
            intra_d, intra_i = _intra_block(kind, metric, values, elems,
                                            eligible, mi, sdim)
            pool_d = jnp.concatenate([pool_d, intra_d], axis=1)
            pool_i = jnp.concatenate([pool_i, intra_i], axis=1)
        # 2. SelectNeighbors over this device's row slice — the (B/N, C, C)
        # pairwise gather+matmul and the sequential select loop are the
        # expensive terms this kernel distributes
        pd_l = jax.lax.dynamic_slice_in_dim(pool_d, didx * b_loc, b_loc)
        pi_l = jax.lax.dynamic_slice_in_dim(pool_i, didx * b_loc, b_loc)
        pd_l, pi_l = _pad_lanes(pd_l, pi_l)
        pair = _pairwise_dists(kind, metric, values, pi_l, sdim)
        forced0 = jnp.zeros(pi_l.shape, jnp.bool_)
        pos, kept = select_neighbors_batch(pd_l, pair, pi_l >= 0, lm, forced0)
        sel_l = _row_gather(pi_l, jnp.maximum(pos, 0))
        sel_l = jnp.where(pos >= 0, sel_l, -1)
        seld_l = jnp.where(pos >= 0, _row_gather(pd_l, jnp.maximum(pos, 0)),
                           jnp.inf)
        keptf_l = kept & (pos >= 0)
        sel = jax.lax.all_gather(sel_l, ax, tiled=True)        # (B, lm)
        sel_d = jax.lax.all_gather(seld_l, ax, tiled=True)
        keptf = jax.lax.all_gather(keptf_l, ax, tiled=True)
        # 3. own-list writes — replicated (every device applies the same
        # scatter so graph replicas stay bit-identical)
        if level0:
            w = jnp.where(eligible, elems, nbr0.shape[0])
            nbr0 = nbr0.at[w].set(sel, mode="drop")
            kept0 = kept0.at[w].set(keptf, mode="drop")
        else:
            slots = up_slot[jnp.maximum(elems, 0)]
            okw = eligible & (slots >= 0)
            wu = jnp.where(okw, slots, nbr_up.shape[0])
            nbr_up = nbr_up.at[wu, lvl_idx].set(sel, mode="drop")
            kept_up = kept_up.at[wu, lvl_idx].set(keptf, mode="drop")
        # 4. backlinks: group edges replicated (one small sort), then merge
        # this device's contiguous slice of target rows.  Padding to
        # chunk·ndev keeps every device's chunk boundaries on the fused
        # kernel's global 0, chunk, 2·chunk… grid, so each chunk sees
        # byte-identical rows
        tgt = sel.reshape(-1)
        src = jnp.repeat(jnp.where(eligible, elems, -1), lm)
        d_e = sel_d.reshape(-1)
        targets, new_src, u_count = _group_edges(tgt, src, d_e, smax)
        e_rows = targets.shape[0]
        pad_rows = (-e_rows) % (chunk * ndev)
        if pad_rows:
            targets = jnp.concatenate(
                [targets, jnp.full((pad_rows,), -1, jnp.int32)])
            new_src = jnp.concatenate(
                [new_src, jnp.full((pad_rows, smax), -1, jnp.int32)])
        rows_loc = targets.shape[0] // ndev
        t_loc = jax.lax.dynamic_slice_in_dim(targets, didx * rows_loc,
                                             rows_loc)
        s_loc = jax.lax.dynamic_slice(new_src, (didx * rows_loc, 0),
                                      (rows_loc, smax))
        n_chunks_loc = rows_loc // chunk
        acc_l = jnp.full((rows_loc, lm), -1, jnp.int32)
        acc_k = jnp.zeros((rows_loc, lm), jnp.bool_)

        def cond(state):
            i = state[0]
            return (i < n_chunks_loc) & (didx * rows_loc + i * chunk < u_count)

        def loop(state):
            i, acc_l, acc_k = state
            t_c = jax.lax.dynamic_slice(t_loc, (i * chunk,), (chunk,))
            s_c = jax.lax.dynamic_slice(s_loc, (i * chunk, 0), (chunk, smax))
            if level0:
                okc = t_c >= 0
                old = jnp.where(okc[:, None], nbr0[jnp.maximum(t_c, 0)], -1)
                oldk = kept0[jnp.maximum(t_c, 0)] & okc[:, None]
            else:
                slots_c = up_slot[jnp.maximum(t_c, 0)]
                okc = (t_c >= 0) & (slots_c >= 0)
                old = jnp.where(okc[:, None],
                                nbr_up[jnp.maximum(slots_c, 0), lvl_idx], -1)
                oldk = kept_up[jnp.maximum(slots_c, 0), lvl_idx] & okc[:, None]
            new_l, new_k = _merge_wholesale_core(
                kind, metric, values, old, oldk, s_c,
                jnp.where(okc, t_c, -1), lm, sdim)
            new_l = jnp.where(okc[:, None], new_l, -1)
            acc_l = jax.lax.dynamic_update_slice(acc_l, new_l, (i * chunk, 0))
            acc_k = jax.lax.dynamic_update_slice(acc_k, new_k & okc[:, None],
                                                 (i * chunk, 0))
            return i + 1, acc_l, acc_k

        _, acc_l, acc_k = jax.lax.while_loop(cond, loop,
                                             (jnp.int32(0), acc_l, acc_k))
        acc_l = jax.lax.all_gather(acc_l, ax, tiled=True)      # (E_pad, lm)
        acc_k = jax.lax.all_gather(acc_k, ax, tiled=True)
        done_rows = (jnp.arange(targets.shape[0], dtype=jnp.int32)
                     < u_count) & (targets >= 0)
        if level0:
            w = jnp.where(done_rows, targets, nbr0.shape[0])
            nbr0 = nbr0.at[w].set(acc_l, mode="drop")
            kept0 = kept0.at[w].set(acc_k, mode="drop")
        else:
            slots_t = up_slot[jnp.maximum(targets, 0)]
            okw2 = done_rows & (slots_t >= 0)
            wu = jnp.where(okw2, slots_t, nbr_up.shape[0])
            nbr_up = nbr_up.at[wu, lvl_idx].set(acc_l, mode="drop")
            kept_up = kept_up.at[wu, lvl_idx].set(acc_k, mode="drop")
        return nbr0, nbr_up, kept0, kept_up

    P = shd.PartitionSpec
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(),) * 11, out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1, 2, 3, 4))


def connect_level_sharded(mesh, kind, metric, values, nbr0, nbr_up, kept0,
                          kept_up, up_slot, elems, eligible, level, pool_d,
                          pool_i, *, level0: bool, m: int, mi: int, smax: int,
                          chunk: int, sdim: int = 0):
    """Mesh-parallel connect_level: SelectNeighbors rows and backlink-merge
    chunks distribute over the devices (the compute-heavy terms), two tiny
    all_gathers restore replicated (B, lm)/(E, lm) results, and every device
    applies the same graph scatters — replicas stay bit-identical to the
    fused single-device kernel (asserted in tests/test_parallel.py).

    Together with wave_search_sharded this makes BOTH build phases
    data-parallel over the mesh — the SPMD counterpart of the reference's
    N-process shared-memory build (hnswbuild.c:925-1062), where workers
    share the search AND the UpdateGraphInMemory work."""
    fn = _connect_sharded_fn(mesh, kind, metric, level0, m, mi, smax, chunk,
                             sdim)
    return fn(values, nbr0, nbr_up, kept0, kept_up, up_slot, elems, eligible,
              level, pool_d, pool_i)


@functools.partial(jax.jit, static_argnames=("kind", "metric", "mi", "sdim"))
def intra_wave_candidates(kind, metric, values, elems, eligible, mi: int,
                          sdim: int = 0):
    """Top-mi nearest *wave-mates* per wave member — one (B, B) distance
    block.  Members of a wave search the frozen graph and never see each
    other (hnswbuild's sequential inserts do); folding the nearest
    wave-mates into each member's candidate pool restores those edges.
    Without this, inner-product graphs lose the chain structure that keeps
    them connected (large waves → hub-only lists → unreachable answers).

    ``eligible`` masks members that exist at the level being connected.
    Returns (dists (B, mi), elem ids (B, mi))."""
    return _intra_core(kind, metric, values, elems, eligible, mi, sdim)


# ---------------------------------------------------------------------------
# wave search — TPU mono-jit and CPU host-driver variants
# ---------------------------------------------------------------------------


def _wave_level_loop(score, qs, lv, entry, entry_level, ef, m, l_unroll,
                     self_ids, exclude_self, greedy_fn, beam_fn):
    """Shared level structure of Algorithm 1 over levels l_unroll..0."""
    nq = lv.shape[0]
    entry_arr = jnp.full((nq,), entry, jnp.int32)
    cur_d = score(qs, entry_arr[:, None])[:, 0]
    cur = entry_arr
    lv_c = jnp.minimum(lv, entry_level)
    pool_d = jnp.full((nq, ef), jnp.inf, jnp.float32)
    pool_i = jnp.full((nq, ef), -1, jnp.int32)
    out_d = [None] * (l_unroll + 1)
    out_i = [None] * (l_unroll + 1)
    for lc in range(l_unroll, -1, -1):
        if lc >= 1:
            g_cur, g_d = greedy_fn(lc, qs, cur, cur_d)
            gm = lv < lc
            cur = jnp.where(gm, g_cur, cur)
            cur_d = jnp.where(gm, g_d, cur_d)
        first = lv_c == lc
        pool_d = jnp.where(first[:, None], jnp.inf, pool_d)
        pool_i = jnp.where(first[:, None], -1, pool_i)
        pool_d = pool_d.at[:, 0].set(jnp.where(first, cur_d, pool_d[:, 0]))
        pool_i = pool_i.at[:, 0].set(jnp.where(first, cur, pool_i[:, 0]))
        pd, pi = beam_fn(lc, qs, pool_d, pool_i)
        bm = (lv >= lc)[:, None]
        pool_d = jnp.where(bm, pd, pool_d)
        pool_i = jnp.where(bm, pi, pool_i)
        o_d, o_i = pool_d, pool_i
        if exclude_self:
            o_i = jnp.where(o_i == self_ids[:, None], -1, o_i)
            o_d = jnp.where(o_i >= 0, o_d, jnp.inf)
        out_d[lc] = o_d
        out_i[lc] = o_i
    return jnp.stack(out_d), jnp.stack(out_i)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "metric", "ef", "m", "l_unroll", "exclude_self",
                     "expand", "vmode", "sdim"),
)
def wave_search(kind, metric, values, nbr0, nbr_up, up_slot, qs, self_ids, lv,
                entry, entry_level, ef: int, m: int, l_unroll: int,
                exclude_self: bool, expand: int = 1, vmode: str = "hash2",
                sdim: int = 0):
    """Full Algorithm 1 search for a wave (TPU mono-jit).  Returns stacked
    per-level pools (l_unroll+1, Q, ef); levels above the dynamic entry
    level terminate in one hop, so one compilation serves every graph
    height ≤ l_unroll."""
    score = make_scorer(kind, metric, values, sdim)
    nbrs = _neighbors_closure(nbr0, nbr_up, up_slot)
    nq = lv.shape[0]

    def greedy_fn(lc, qs_, cur, cur_d):
        return greedy_descent(score, nbrs, qs_, cur, cur_d, jnp.int32(lc),
                              m, max_steps=512)

    def beam_fn(lc, qs_, pool_d, pool_i):
        visited = visited_init(nq, ef, vmode)
        pd, pi, _, _ = search_layer(
            score, lambda e, _lc=lc: nbrs(e, jnp.int32(_lc)), qs_,
            pool_d, pool_i, visited, ef=ef, max_steps=4 * ef + 64,
            expand=expand, vmode=vmode,
        )
        return pd, pi

    return _wave_level_loop(score, qs, lv, entry, entry_level, ef, m,
                            l_unroll, self_ids, exclude_self,
                            greedy_fn, beam_fn)


def wave_search_host(kind, metric, values, nbr0, nbr_up, up_slot, qs, self_ids,
                     lv, entry, entry_level, ef: int, m: int, l_unroll: int,
                     exclude_self: bool, expand: int = 1,
                     vmode: str = "hash2", sdim: int = 0):
    """CPU variant: same level structure, host-driven loops."""
    score = lambda q, r: score_block(kind, metric, values, q, r, sdim)
    nq = lv.shape[0]

    def greedy_fn(lc, qs_, cur, cur_d):
        return greedy_descent_host(kind, metric, values, nbr0, nbr_up,
                                   up_slot, lc, qs_, cur, cur_d,
                                   max_steps=512, sdim=sdim)

    def beam_fn(lc, qs_, pool_d, pool_i):
        visited = visited_init(nq, ef, vmode)
        pd, pi, _, _ = search_layer_host(
            kind, metric, values, nbr0, nbr_up, up_slot, lc, qs_,
            pool_d, pool_i, visited, ef=ef, max_steps=4 * ef + 64,
            expand=expand, vmode=vmode, sdim=sdim,
        )
        return pd, pi

    return _wave_level_loop(score, qs, jnp.asarray(lv), entry, entry_level,
                            ef, m, l_unroll, self_ids, exclude_self,
                            greedy_fn, beam_fn)


@functools.lru_cache(maxsize=None)
def _wave_search_sharded_fn(mesh, kind, metric, ef: int, m: int,
                            l_unroll: int, exclude_self: bool, expand: int,
                            vmode: str, sdim: int = 0):
    """Build (and cache) the jitted shard_map program for
    wave_search_sharded.  Two deliberate choices, both load-bearing for
    bit-identity (round-5 sparse regression, VERDICT r4 weak #1):

    - the per-level pools are all_gathered to REPLICATED inside the body
      (out_specs P(), not P(None, ax)).  Handing query-sharded pools to
      the eager downstream consumers (the upper-level compaction gather +
      the connect kernels) produced graphs that diverged from the
      single-device build on ~1/3 of random sparse datasets even though
      every host-read of the same pools was bit-identical — a
      layout-sensitive XLA:CPU virtual-mesh artifact that explicit
      replication removes by construction.  On real hardware the gather
      must happen anyway before the replicated connect, and the
      (L+1, B, ef) blocks are KBs riding ICI.
    - the program is jitted once per static config instead of re-tracing
      an anonymous shard_map every wave."""
    import jax.sharding as shd

    ax = mesh.axis_names[0]

    def local(values, nbr0, nbr_up, up_slot, qs, self_ids, lv,
              entry, entry_level):
        od, oi = wave_search(kind, metric, values, nbr0, nbr_up, up_slot,
                             qs, self_ids, lv, entry, entry_level, ef=ef,
                             m=m, l_unroll=l_unroll,
                             exclude_self=exclude_self, expand=expand,
                             vmode=vmode, sdim=sdim)
        od = jax.lax.all_gather(od, ax, axis=1, tiled=True)
        oi = jax.lax.all_gather(oi, ax, axis=1, tiled=True)
        return od, oi

    P = shd.PartitionSpec
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(ax), P(ax), P(ax), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def wave_search_sharded(mesh, kind, metric, values, nbr0, nbr_up, up_slot,
                        qs, self_ids, lv, entry, entry_level, *, ef: int,
                        m: int, l_unroll: int, exclude_self: bool,
                        expand: int = 1, vmode: str = "hash2",
                        sdim: int = 0):
    """Multi-device wave search for building ONE graph: the wave's queries
    split across the mesh (data parallelism over the insert wave — the SPMD
    mapping of the reference's parallel build, where N processes run
    HnswFindElementNeighbors concurrently against one shared-memory graph,
    hnswbuild.c:925-1062 / workers at 838-883), while the graph and value
    arrays are replicated per device.

    Each query's beam search is completely independent (the reference's
    workers share only the graph, read-mostly), so the gathered pools are
    bit-identical to single-device ``wave_search`` output; the connect
    step — and therefore the final graph — is unchanged.  The pools are
    returned REPLICATED (in-body all_gather over ICI) — see
    _wave_search_sharded_fn for why that is a correctness requirement,
    not a convenience."""
    fn = _wave_search_sharded_fn(mesh, kind, metric, ef, m, l_unroll,
                                 exclude_self, expand, vmode, sdim)
    return fn(values, nbr0, nbr_up, up_slot, qs, self_ids, lv,
              entry, entry_level)


# ---------------------------------------------------------------------------
# query search — TPU mono-jit and CPU host-driver variants
# ---------------------------------------------------------------------------


def _expand_topk(pool_d, pool_i, elem_rows, row_valid, fmask, k: int,
                 heaptids: int):
    """Heap-TID expansion + validity/filter mask + top-k
    (hnswscan.c:286-303).  ``fmask=None`` means no qual filter — the
    common unfiltered scan skips both the mask gather and the eager
    host-side ``jnp.ones(capacity)`` dispatch it used to require."""
    nq = pool_d.shape[0]
    safe = jnp.maximum(pool_i, 0)
    rows = elem_rows[safe].reshape(nq, -1)
    rd = jnp.repeat(pool_d, heaptids, axis=1)
    rows = jnp.where(jnp.repeat(pool_i, heaptids, axis=1) >= 0, rows, -1)
    safe_rows = jnp.maximum(rows, 0)
    ok = (rows >= 0) & row_valid[safe_rows]
    if fmask is not None:
        ok = ok & fmask[safe_rows]
    rd = jnp.where(ok, rd, jnp.inf)
    kk = min(k, rd.shape[1])
    neg, selpos = jax.lax.top_k(-rd, kk)
    d = -neg
    r = jnp.take_along_axis(rows, selpos, axis=1)
    if kk < k:
        d = jnp.concatenate([d, jnp.full((nq, k - kk), jnp.inf, d.dtype)], axis=1)
        r = jnp.concatenate([r, jnp.full((nq, k - kk), -1, r.dtype)], axis=1)
    r = jnp.where(jnp.isinf(d), -1, r)
    return d, r


@functools.partial(
    jax.jit,
    static_argnames=("kind", "metric", "ef", "m", "l_unroll", "k", "heaptids",
                     "expand", "vmode", "rerank", "max_steps", "pallas_tail",
                     "prune", "user_dist", "sdim"),
    # the packed cache is DONATED and returned verbatim: as a read-only
    # entry parameter feeding the hop while_loop, XLA copy-insertion gave
    # the loop its own 8 GB copy of the cache (the round-5 GIST-200k int8
    # OOM: 17.8 G needed of 15.75 G).  Donation lets buffer assignment
    # hand the loop the caller's buffer; the caller rebinds its reference
    # to the aliased output (hnsw._search_once).
    donate_argnames=("packed_vals",),
)
def query_search(kind, metric, values, nbr0, nbr_up, up_slot, elem_rows,
                 row_valid, fmask, qs, entry, entry_level, ef: int, m: int,
                 l_unroll: int, k: int, heaptids: int, expand: int = 1,
                 vmode: str = "hash2", packed_vals=None, rerank: bool = False,
                 max_steps: int = 0, pallas_tail: bool = False,
                 qs_packed=None, packed_scale=None, packed_norm2=None,
                 prune: int = 0, user_dist: bool = False, sdim: int = 0):
    """Algorithm 5 (hnswscan.c:25-56), TPU mono-jit.

    ``packed_vals`` — optional adjacency-packed neighbor values
    (nbr_vals[cap, 2m, D'], possibly bf16 and possibly *sketched*, i.e.
    randomly projected D→D' for large dims): layer 0 scores whole
    neighbor slabs instead of per-row value gathers (see _hop_body).
    ``qs_packed`` — the matching query representation (defaults to
    ``qs``; the D→D' projection of the queries when sketched).  With
    ``rerank``, the final ef pool is re-scored against the exact f32
    stored values (one ef-row gather) so reduced-precision packing never
    changes the emitted ordering beyond pool admission."""
    score = make_scorer(kind, metric, values, sdim)
    nbrs = _neighbors_closure(nbr0, nbr_up, up_slot)
    nq = qs.shape[0] if not isinstance(qs, tuple) else qs[0].shape[0]

    entry_arr = jnp.full((nq,), entry, jnp.int32)
    cur_d = score(qs, entry_arr[:, None])[:, 0]
    cur = entry_arr
    for lc in range(l_unroll, 0, -1):
        cur, cur_d = greedy_descent(score, nbrs, qs, cur, cur_d, jnp.int32(lc),
                                    m, max_steps=512)
    visited = visited_init(nq, ef, vmode)
    if packed_vals is not None:
        packed = (packed_vals, qs if qs_packed is None else qs_packed,
                  packed_scale, packed_norm2)
    else:
        packed = None
    pool_d, pool_i, _, steps = search_layer(
        score, lambda e: nbrs(e, jnp.int32(0)), qs, cur_d[:, None],
        cur[:, None], visited, ef=ef,
        max_steps=max_steps or (8 * ef + 64),
        expand=expand, vmode=vmode, packed=packed, metric=metric,
        pallas_tail=pallas_tail, prune=prune,
    )
    if rerank:
        pool_d = score(qs, pool_i)  # exact f32 distances for the final pool
        pool_d, pool_i = jax.lax.sort((pool_d, pool_i), num_keys=1)
    d, r = _expand_topk(pool_d, pool_i, elem_rows, row_valid, fmask, k, heaptids)
    if user_dist:
        # fold the stored→operator transform into the mono-jit so a
        # latency-bound batch-1 scan needs no eager follow-up dispatches
        from ..ops.metric import stored_to_user

        d = stored_to_user(metric, d)
    # pass the donated cache back out (aliased, not copied) — see the
    # donate_argnames note above; None when no packed cache is in play
    return d, r, steps, packed_vals


@functools.partial(jax.jit, static_argnames=("k", "heaptids"))
def _expand_topk_jit(pool_d, pool_i, elem_rows, row_valid, fmask,
                     k: int, heaptids: int):
    return _expand_topk(pool_d, pool_i, elem_rows, row_valid, fmask, k, heaptids)


# ---------------------------------------------------------------------------
# iterative scans — persistent visited set + discarded pool
# (GetScanItems with keepSearchedLength/discarded, hnswscan.c:25-56;
#  ResumeScanItems, hnswscan.c:61-87)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("kind", "metric", "ef", "m", "l_unroll", "dk", "expand",
                     "sdim"),
)
def query_search_first(kind, metric, values, nbr0, nbr_up, up_slot, qs,
                       entry, entry_level, ef: int, m: int, l_unroll: int,
                       dk: int, expand: int = 1, sdim: int = 0):
    """First batch of an iterative scan: Algorithm 5 with a live discarded
    pool.  Returns (pool_d, pool_i, visited, disc_d, disc_i) — the scan
    state a resume continues from."""
    score = make_scorer(kind, metric, values, sdim)
    nbrs = _neighbors_closure(nbr0, nbr_up, up_slot)
    nq = qs.shape[0] if not isinstance(qs, tuple) else qs[0].shape[0]
    entry_arr = jnp.full((nq,), entry, jnp.int32)
    cur_d = score(qs, entry_arr[:, None])[:, 0]
    cur = entry_arr
    for lc in range(l_unroll, 0, -1):
        cur, cur_d = greedy_descent(score, nbrs, qs, cur, cur_d, jnp.int32(lc),
                                    m, max_steps=512)
    visited = visited_init(nq, ef)
    disc = (jnp.full((nq, dk), jnp.inf, jnp.float32),
            jnp.full((nq, dk), -1, jnp.int32))
    pool_d, pool_i, visited, (disc_d, disc_i), _, scanned = search_layer(
        score, lambda e: nbrs(e, jnp.int32(0)), qs, cur_d[:, None],
        cur[:, None], visited, ef=ef, max_steps=8 * ef + 64,
        expand=expand, disc=disc,
    )
    return pool_d, pool_i, visited, disc_d, disc_i, scanned


@functools.partial(
    jax.jit, static_argnames=("kind", "metric", "ef", "m", "expand", "sdim")
)
def query_search_resume(kind, metric, values, nbr0, nbr_up, up_slot, qs,
                        visited, disc_d, disc_i, ef: int, m: int,
                        expand: int = 1, sdim: int = 0):
    """ResumeScanItems (hnswscan.c:61-87): re-seed a layer-0 search from the
    best ef discarded candidates WITHOUT resetting the visited set
    (initVisited=false), keeping the rest of the discarded pool live."""
    score = make_scorer(kind, metric, values, sdim)
    nbrs = _neighbors_closure(nbr0, nbr_up, up_slot)
    nq = disc_d.shape[0]
    dk = disc_d.shape[1]
    seed_d, seed_i = disc_d[:, :ef], disc_i[:, :ef]
    keep = min(ef, dk)
    rest_d = jnp.concatenate(
        [disc_d[:, keep:], jnp.full((nq, keep), jnp.inf, jnp.float32)], axis=1)
    rest_i = jnp.concatenate(
        [disc_i[:, keep:], jnp.full((nq, keep), -1, jnp.int32)], axis=1)
    pool_d, pool_i, visited, (disc_d, disc_i), _, scanned = search_layer(
        score, lambda e: nbrs(e, jnp.int32(0)), qs, seed_d, seed_i,
        visited, ef=ef, max_steps=8 * ef + 64, expand=expand,
        disc=(rest_d, rest_i),
    )
    return pool_d, pool_i, visited, disc_d, disc_i, scanned


def query_search_host(kind, metric, values, nbr0, nbr_up, up_slot, elem_rows,
                      row_valid, fmask, qs, entry, entry_level, ef: int,
                      m: int, l_unroll: int, k: int, heaptids: int,
                      expand: int = 1, vmode: str = "hash2",
                      packed_vals=None, rerank: bool = False,
                      max_steps: int = 0, pallas_tail: bool = False,
                      qs_packed=None, packed_scale=None, packed_norm2=None,
                      prune: int = 0, user_dist: bool = False, sdim: int = 0):
    """CPU variant of Algorithm 5 with host-driven loops.  The packed-
    adjacency path is a device-gather optimization; the host driver always
    scores via row gathers (packed_vals/rerank/pallas_tail accepted for
    signature parity, ignored); ``max_steps`` caps layer-0 hops like the
    device path."""
    nq = qs.shape[0] if not isinstance(qs, tuple) else qs[0].shape[0]
    entry_arr = jnp.full((nq,), entry, jnp.int32)
    cur_d = score_block(kind, metric, values, qs, entry_arr[:, None],
                        sdim)[:, 0]
    cur = entry_arr
    for lc in range(int(entry_level), 0, -1):
        cur, cur_d = greedy_descent_host(kind, metric, values, nbr0, nbr_up,
                                         up_slot, lc, qs, cur, cur_d,
                                         max_steps=512, sdim=sdim)
    visited = visited_init(nq, ef, vmode)
    pool_d, pool_i, _, steps = search_layer_host(
        kind, metric, values, nbr0, nbr_up, up_slot, 0, qs,
        cur_d[:, None], cur[:, None], visited, ef=ef,
        max_steps=max_steps or (8 * ef + 64), vmode=vmode, sdim=sdim,
    )
    d, r = _expand_topk_jit(pool_d, pool_i, elem_rows, row_valid, fmask, k,
                            heaptids)
    if user_dist:
        from ..ops.metric import stored_to_user

        d = stored_to_user(metric, d)
    return d, r, steps, packed_vals  # interface parity with query_search
