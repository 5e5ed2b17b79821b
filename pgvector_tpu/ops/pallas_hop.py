"""Pallas fused hop-tail for the HNSW beam search.

The packed-adjacency scan's remaining per-hop cost is pool maintenance:
candidate dedup, the in-pool membership block, and the (ef+W)-wide
2-operand merge sort all run as separate XLA ops with HBM round-trips
between them (~10-12 ms/hop at Q=4000, W=256 — the value gather itself is
~1-2 ms after slab packing).  This kernel fuses the whole tail in VMEM:

1. one bitonic sort of [pool ∥ candidates] by (id, position) — duplicate
   ids become adjacent, and because pool entries carry the smallest
   positions, the surviving copy of any id is the pool's (preserving its
   expanded flag).  Later copies are masked.  This replaces BOTH the
   in-hop dedup and the (W×ef) in-pool block.
2. one bitonic sort by (distance, position) — equivalent to the XLA
   path's stable `lax.sort` (stability ⇔ position tiebreak), so results
   are BIT-IDENTICAL to the unfused tail, not merely equivalent.
3. emit the first ef lanes as the new pool.

Comparators are lexicographic two-key (the position key makes every
element distinct, so compare-exchanges are unambiguous); lane exchanges
use pltpu.roll (partner lane i^j via two rolls selected by bit j of the
lane index).  Everything is VPU work on (R, width) tiles.

Used only on the non-iterative dense query path (visited off, no
discarded pool); the XLA tail remains the reference implementation and
the fallback (PGVECTOR_TPU_PALLAS_TAIL=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas import is cheap; kernels only compile on use
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

#: finite sentinel — masked lanes sort to the end (python literals: traced
#: module constants would be captured by the kernel closure, which
#: pallas_call rejects)
BIG = 3.0e38
#: id sentinel for masked lanes (sorts after every real id)
ID_INF = 2**31 - 2**20

ROWS = 256  # query rows per grid step


def _bitonic_sort(key1, key2, payloads, width: int):
    """In-register bitonic sort along the lane axis by (key1, key2) asc.

    ``key2`` must make every element distinct (a position index), so the
    comparator is a strict total order.  ``payloads`` is a tuple of arrays
    permuted alongside."""
    lane = jax.lax.broadcasted_iota(jnp.int32, key1.shape, 1)

    width_n = key1.shape[1]

    def cx(arrs, j, k_size):
        k1, k2 = arrs[0], arrs[1]
        low = (lane & j) == 0  # this lane is the low partner of the pair
        up = (lane & k_size) == 0  # ascending block
        def partner(a):
            # roll(x, s)[i] = x[(i - s) % n]; partner i+j needs s = -j,
            # expressed as the non-negative width−j (pltpu.roll rejects
            # negative shifts)
            return jnp.where(low, pltpu.roll(a, width_n - j, 1),
                             pltpu.roll(a, j, 1))
        o1, o2 = partner(k1), partner(k2)
        self_less = (k1 < o1) | ((k1 == o1) & (k2 < o2))
        want_min = low == up
        # want_min ? ~self_less : self_less ≡ XOR — Mosaic cannot lower a
        # select between i1 vectors ("Unsupported target bitwidth for
        # truncation")
        take_other = want_min ^ self_less
        out = []
        for a in arrs:
            oa = partner(a)
            out.append(jnp.where(take_other, oa, a))
        return out

    arrs = [key1, key2] + list(payloads)
    k_size = 2
    while k_size <= width:
        j = k_size // 2
        while j >= 1:
            arrs = cx(arrs, j, k_size)
            j //= 2
        k_size *= 2
    return arrs[0], arrs[1], tuple(arrs[2:])


def _tail_kernel(pool_d_ref, pool_p_ref, cand_d_ref, cand_i_ref,
                 out_d_ref, out_p_ref, *, ef: int, w: int, width: int):
    pool_d = pool_d_ref[:]
    pool_p = pool_p_ref[:]
    cand_d = cand_d_ref[:]
    cand_i = cand_i_ref[:]
    r = pool_d.shape[0]
    pad = width - ef - w
    # element arrays: [pool | cands | pad]; ids for the dedup sort; packed
    # payload (id·2|flag for pool, id·2 for cands)
    ids = jnp.concatenate(
        [pool_p >> 1, cand_i,
         jnp.full((r, pad), ID_INF, jnp.int32)], axis=1)
    ids = jnp.where(ids < 0, ID_INF, ids)
    d = jnp.concatenate(
        [pool_d, cand_d, jnp.full((r, pad), BIG, jnp.float32)], axis=1)
    d = jnp.where(jnp.isinf(d) | (ids == ID_INF), BIG, d)
    packed = jnp.concatenate(
        [pool_p, cand_i * 2, jnp.full((r, pad), -2, jnp.int32)], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (r, width), 1)

    # pass 1: sort by (id, pos); mask every later copy of an id (the pool
    # copy has the smallest pos, so its flag survives)
    ids_s, pos_s, (d_s, packed_s) = _bitonic_sort(ids, pos, (d, packed),
                                                  width)
    prev = pltpu.roll(ids_s, 1, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, ids_s.shape, 1)
    dup = (lane > 0) & (ids_s == prev) & (ids_s != ID_INF)
    d_s = jnp.where(dup, BIG, d_s)
    pos_s = jnp.where(dup, pos_s + width, pos_s)  # keep keys distinct

    # pass 2: sort by (d, pos) — the stable distance order
    d_f, _, (packed_f,) = _bitonic_sort(d_s, pos_s, (packed_s,), width)

    out_d_ref[:] = jnp.where(d_f[:, :ef] >= BIG, jnp.inf, d_f[:, :ef])
    out_p_ref[:] = jnp.where(d_f[:, :ef] >= BIG, -2, packed_f[:, :ef])


@functools.partial(jax.jit, static_argnames=("ef", "w"))
def hop_tail(pool_d, pool_p, cand_d, cand_i, ef: int, w: int):
    """Fused dedup + in-pool + merge: returns (pool_d, pool_p) of width ef,
    bit-identical to the XLA stable-sort tail."""
    q = pool_d.shape[0]
    width = 1
    while width < ef + w:
        width *= 2
    rpad = (-q) % ROWS
    if rpad:
        pool_d = jnp.pad(pool_d, ((0, rpad), (0, 0)),
                         constant_values=jnp.inf)
        pool_p = jnp.pad(pool_p, ((0, rpad), (0, 0)), constant_values=-2)
        cand_d = jnp.pad(cand_d, ((0, rpad), (0, 0)),
                         constant_values=jnp.inf)
        cand_i = jnp.pad(cand_i, ((0, rpad), (0, 0)), constant_values=-1)
    qp = q + rpad
    grid = qp // ROWS
    out_d, out_p = pl.pallas_call(
        functools.partial(_tail_kernel, ef=ef, w=w, width=width),
        # CPU backends run the interpreter (tests); TPU compiles
        interpret=jax.default_backend() != "tpu",
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ROWS, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, ef), jnp.float32),
            jax.ShapeDtypeStruct((qp, ef), jnp.int32),
        ],
    )(pool_d, pool_p, cand_d, cand_i)
    return out_d[:q], out_p[:q]
