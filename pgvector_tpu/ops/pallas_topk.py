"""Pallas fused exact-search kernel: tiled distance matmul + running top-k.

The XLA path (ops.topk.tiled_topk) scans DB tiles with a lax.scan whose body
materializes each (Q, T) score block and merges with lax.top_k.  This kernel
fuses the whole per-tile pipeline in VMEM — MXU matmul, score formation, and
a k-pass selection merge into a running (Q, k) result — so score blocks
never round-trip through HBM and the DB streams through the grid pipeline
at HBM bandwidth.

L2 ordering trick: per query, ``|q|² - 2 q·x + |x|²`` orders identically to
``|x|² - 2 q·x``, so the kernel tracks the q-independent form and the
caller adds ``|q|²`` back at the end (the same squared-ordering the L2
opclasses use, sql/vector.sql:409).

Used by FlatIndex on TPU for L2/IP/cosine when shapes qualify; everything
else falls back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .metric import Metric

try:  # pallas import is cheap; kernels only compile on use
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

TILE = 2048  # DB rows per grid step (f32[TILE, D] staged in VMEM)


def _kernel(qs_ref, db_ref, dbsq_ref, out_d_ref, out_i_ref, best_d, best_i,
            *, k: int, tile: int):
    """One grid step: score this DB tile and fold it into the running
    (Q, k) best.  Scores = dbsq - 2·q·x (L2 ordering) — for IP the caller
    passes dbsq = 0 so scores = -2·ip (ordering-equivalent, rescaled
    back by the caller)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.full_like(best_i, -1)

    ip = jax.lax.dot_general(
        qs_ref[:], db_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # f32-exact like the XLA path
    )  # (Q, T)
    scores = dbsq_ref[:].reshape(1, -1) - 2.0 * ip
    base = t * tile
    nq = scores.shape[0]

    # merge: k selection passes over [best | tile] — O(k·(k+T)) VPU work,
    # small next to the MXU matmul
    comb_d = jnp.concatenate([best_d[:], scores], axis=1)  # (Q, k+T)
    tile_ids = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 1) + base
    comb_i = jnp.concatenate([best_i[:], tile_ids], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, comb_d.shape, 1)
    out_ds = []
    out_is = []
    for j in range(k):
        m = jnp.min(comb_d, axis=1)  # (Q,)
        amin = jnp.argmin(comb_d, axis=1)  # (Q,)
        hit = col == amin[:, None]
        # gather-free select: exactly one hit per row (Mosaic has no gather)
        sel_i = jnp.sum(jnp.where(hit, comb_i, 0), axis=1)
        out_ds.append(m)
        out_is.append(sel_i)
        comb_d = jnp.where(hit, jnp.inf, comb_d)
    best_d[:] = jnp.stack(out_ds, axis=1)
    best_i[:] = jnp.stack(out_is, axis=1)

    @pl.when(t == pl.num_programs(0) - 1)
    def _out():
        out_d_ref[:] = best_d[:]
        out_i_ref[:] = jnp.where(jnp.isinf(best_d[:]), -1, best_i[:])


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def _pallas_scan(qs, db, dbsq, k: int, tile: int):
    n = db.shape[0]
    nq, d = qs.shape
    grid = n // tile
    return pl.pallas_call(
        functools.partial(_kernel, k=k, tile=tile),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((nq, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda t: (t,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nq, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nq, k), jnp.float32),
            pltpu.VMEM((nq, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d, bytes_accessed=n * d * 4 + nq * d * 4,
            transcendentals=0,
        ),
    )(qs, db, dbsq)


def supported(metric: Metric, dtype) -> bool:
    # cosine needs pre-normalized rows (the stored-value form); FlatIndex
    # scans raw tables, so only L2/IP route here
    return (
        HAVE_PALLAS
        and jax.default_backend() == "tpu"
        and metric in (Metric.L2, Metric.IP)
    )


def exact_topk(
    metric: Metric,
    qs: jnp.ndarray,  # (Q, D) f32 — pre-normalized for cosine
    db: jnp.ndarray,  # (N, D)
    k: int,
    valid=None,
    tile: int = TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused top-k.  Returns stored distances (L2→squared, IP/cos→-ip) and
    row ids, matching ops.topk.tiled_topk's contract."""
    n, d = db.shape
    dbf = db.astype(jnp.float32)
    qf = qs.astype(jnp.float32)
    pad = (-n) % tile
    if pad:
        dbf = jnp.pad(dbf, ((0, pad), (0, 0)))
    if metric is Metric.L2:
        dbsq = jnp.sum(dbf * dbf, axis=1)
    else:
        dbsq = jnp.zeros(n + pad, jnp.float32)
    # dead/padded rows: push beyond any real score
    live = jnp.arange(n + pad) < n
    if valid is not None:
        live = live & jnp.pad(valid[:n], (0, pad))
    dbsq = jnp.where(live, dbsq, jnp.inf)
    # pad queries to an 8-sublane multiple
    nq = qf.shape[0]
    qpad = (-nq) % 8
    if qpad:
        qf = jnp.pad(qf, ((0, qpad), (0, 0)))
    raw_d, ids = _pallas_scan(qf, dbf, dbsq, k, tile)
    raw_d, ids = raw_d[:nq], ids[:nq]
    if metric is Metric.L2:
        q_sq = jnp.sum(qf[:nq] * qf[:nq], axis=1, keepdims=True)
        d_out = jnp.where(jnp.isinf(raw_d), jnp.inf,
                          jnp.maximum(raw_d + q_sq, 0.0))
    else:
        # raw = -2·ip → stored = -ip
        d_out = jnp.where(jnp.isinf(raw_d), jnp.inf, raw_d * 0.5)
    return d_out, ids
