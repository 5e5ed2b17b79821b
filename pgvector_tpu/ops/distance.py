"""Batched distance computation — the MXU-native replacement for pgvector's
per-pair SIMD kernels (src/vector.c:560-735, src/halfutils.c, src/bitutils.c,
src/sparsevec.c:822-1056).

Where the reference computes one pair per fmgr call, every function here
computes a full (Q, N) block so the FLOPs land on the MXU:

- dense L2² / IP / cosine ride one ``q @ db.T`` matmul plus row norms,
- L1 is a tiled VPU reduction,
- Hamming/Jaccard are XOR/AND + ``lax.population_count`` on packed uint32
  lanes (the TPU analogue of AVX512-VPOPCNTDQ, src/bitutils.c:76-96),
- sparse metrics reduce to IP-plus-corrections via a searchsorted merge of
  sorted index arrays (the vectorized form of the reference's merge joins).

Distances returned are the *stored* forms used by index ordering (L2 →
squared, IP → negative, cosine → 1 - cos); convert with
``metric.stored_to_user`` for operator-level values.  Accumulation is f32
like the reference kernels (norms in f64 happen only in the host value
layer).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .metric import Metric
from ..config import config


def dot_precision():
    """Matmul precision for distance kernels.  pgvector accumulates in f32
    (src/vector.c:560-574); JAX's default TPU matmul is bf16, which loses
    ~1e-2 on SIFT-scale dot products, so the default here is HIGHEST
    (f32-accurate via multi-pass bf16 on the MXU).  Lower via
    config.set("compute.matmul_precision", ...) to trade recall-irrelevant
    precision for MXU throughput."""
    name = config.get("compute.matmul_precision")
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]

# ---------------------------------------------------------------------------
# dense: float32 / bfloat16 / float16
# ---------------------------------------------------------------------------


def sq_norms(db: jnp.ndarray) -> jnp.ndarray:
    """Row squared norms, f32 accumulation."""
    dbf = db.astype(jnp.float32)
    return jnp.sum(dbf * dbf, axis=-1)


def dense_scores(
    metric: Metric,
    q: jnp.ndarray,  # (Q, D)
    db: jnp.ndarray,  # (N, D)
    db_sq: Optional[jnp.ndarray] = None,  # (N,) precomputed squared norms
) -> jnp.ndarray:
    """(Q, N) stored distances for a dense block.

    One MXU matmul serves L2²/IP/cosine; L1 is an elementwise reduction
    (callers should tile N for L1 to bound the (Q, N, D) intermediate).
    """
    qf = q.astype(jnp.float32)
    dbf = db.astype(jnp.float32)
    if metric in (Metric.L2, Metric.IP, Metric.COSINE):
        ip = jax.lax.dot_general(
            qf, dbf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(),
        )  # (Q, N)
        if metric is Metric.IP:
            return -ip
        if metric is Metric.L2:
            q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)
            d_sq = sq_norms(dbf)[None, :] if db_sq is None else db_sq[None, :]
            return jnp.maximum(q_sq - 2.0 * ip + d_sq, 0.0)
        # cosine: 1 - ip / (|q||db|); zero-norm rows produce +inf distance so
        # they sort last (the reference refuses to index zero vectors for
        # cosine at all, hnswutils.c:417-423)
        q_n = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))
        d_sq = sq_norms(dbf)[None, :] if db_sq is None else db_sq[None, :]
        d_n = jnp.sqrt(d_sq)
        denom = q_n * d_n
        cos = jnp.where(denom > 0, ip / jnp.where(denom > 0, denom, 1.0), -jnp.inf)
        return 1.0 - cos
    if metric is Metric.L1:
        return jnp.sum(jnp.abs(qf[:, None, :] - dbf[None, :, :]), axis=-1)
    raise ValueError(f"metric {metric} is not a dense metric")


def dense_pair(metric: Metric, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise stored distance for aligned batches (B, D) x (B, D) → (B,).
    The batched analogue of a single fmgr distance call."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    if metric is Metric.L2:
        d = af - bf
        return jnp.sum(d * d, axis=-1)
    if metric is Metric.IP:
        return -jnp.sum(af * bf, axis=-1)
    if metric is Metric.COSINE:
        ip = jnp.sum(af * bf, axis=-1)
        denom = jnp.sqrt(jnp.sum(af * af, axis=-1) * jnp.sum(bf * bf, axis=-1))
        cos = jnp.where(denom > 0, ip / jnp.where(denom > 0, denom, 1.0), -jnp.inf)
        return 1.0 - cos
    if metric is Metric.L1:
        return jnp.sum(jnp.abs(af - bf), axis=-1)
    raise ValueError(f"metric {metric} is not a dense metric")


# ---------------------------------------------------------------------------
# binary: packed uint32 lanes, MSB-first within each 32-bit word
# ---------------------------------------------------------------------------


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(…, D) bool → (…, ceil(D/32)) uint32, bit i → word i//32 bit
    31-(i%32).  Consistent with the MSB-first byte layout of VARBITS /
    binary_quantize (src/vector.c:952-978) when bytes are read big-endian."""
    d = bits.shape[-1]
    pad = (-d) % 32
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), bits.dtype)], axis=-1
        )
    w = bits.reshape(bits.shape[:-1] + ((d + pad) // 32, 32)).astype(jnp.uint32)
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    return jnp.sum(w << shifts, axis=-1, dtype=jnp.uint32)


def popcount_rows(words: jnp.ndarray) -> jnp.ndarray:
    """Row popcounts of packed uint32 (…, W) → (…,) int32."""
    return jnp.sum(jax.lax.population_count(words).astype(jnp.int32), axis=-1)


def bit_scores(
    metric: Metric,
    q: jnp.ndarray,  # (Q, W) uint32 packed
    db: jnp.ndarray,  # (N, W) uint32 packed
    db_pop: Optional[jnp.ndarray] = None,  # (N,) precomputed popcounts
) -> jnp.ndarray:
    """(Q, N) Hamming or Jaccard distances on packed words.

    Hamming = popcount(a XOR b) (src/bitutils.c:49-73); Jaccard =
    1 - |a∩b| / (|a| + |b| - |a∩b|), empty∩empty → 1 (src/bitutils.c:98-131).
    """
    if metric is Metric.HAMMING:
        x = jnp.bitwise_xor(q[:, None, :], db[None, :, :])
        return jnp.sum(
            jax.lax.population_count(x).astype(jnp.int32), axis=-1
        ).astype(jnp.float32)
    if metric is Metric.JACCARD:
        ab = jnp.sum(
            jax.lax.population_count(
                jnp.bitwise_and(q[:, None, :], db[None, :, :])
            ).astype(jnp.int32),
            axis=-1,
        ).astype(jnp.float32)
        aa = popcount_rows(q).astype(jnp.float32)[:, None]
        bb = (popcount_rows(db) if db_pop is None else db_pop).astype(jnp.float32)[None, :]
        denom = aa + bb - ab
        return jnp.where(ab == 0, 1.0, 1.0 - ab / jnp.where(denom > 0, denom, 1.0))
    raise ValueError(f"metric {metric} is not a bit metric")


# ---------------------------------------------------------------------------
# sparse: padded CSR rows {indices int32[N, P] (sorted, -pad with big), values
# f32[N, P]} vs a single sparse query {q_idx int32[P'], q_val f32[P']}
# ---------------------------------------------------------------------------

#: Index padding sentinel — larger than any valid index (dim < 2^30).
SPARSE_PAD = jnp.int32(2**30)


def _overlap_gather(q_idx: jnp.ndarray, q_val: jnp.ndarray, idx: jnp.ndarray):
    """For each stored entry index, find the matching query value (0 when
    absent).  ``q_idx`` must be sorted ascending; ``idx`` is (…, P) padded
    with SPARSE_PAD.  This is the vectorized merge join of
    src/sparsevec.c:822-932."""
    pos = jnp.searchsorted(q_idx, idx.reshape(-1)).reshape(idx.shape)
    pos = jnp.clip(pos, 0, q_idx.shape[0] - 1)
    match = q_idx[pos] == idx
    return jnp.where(match, q_val[pos], 0.0), match


def sparse_scores(
    metric: Metric,
    q_idx: jnp.ndarray,  # (Pq,) sorted, padded with SPARSE_PAD
    q_val: jnp.ndarray,  # (Pq,) 0 at pads
    idx: jnp.ndarray,  # (N, P) sorted rows, padded with SPARSE_PAD
    val: jnp.ndarray,  # (N, P) 0 at pads
    row_sq: Optional[jnp.ndarray] = None,  # (N,) squared norms
    row_abs: Optional[jnp.ndarray] = None,  # (N,) L1 norms (for L1 metric)
) -> jnp.ndarray:
    """(N,) stored distances from one sparse query to all rows.

    All metrics reduce to the overlap inner product plus norm corrections:
      L2²  = |q|² + |r|² - 2·ip
      -IP  = -ip
      cos  = 1 - ip/(|q||r|)
      L1   = Σ|q| + Σ|r| + Σ_overlap(|qv-rv| - |qv| - |rv|)
    matching the merge-join accumulations in src/sparsevec.c:822-1056.
    """
    qv_at, match = _overlap_gather(q_idx, q_val, idx)
    if metric is Metric.L1:
        overlap = jnp.sum(
            jnp.where(match, jnp.abs(qv_at - val) - jnp.abs(qv_at) - jnp.abs(val), 0.0),
            axis=-1,
        )
        q_abs = jnp.sum(jnp.abs(q_val))
        r_abs = jnp.sum(jnp.abs(val), axis=-1) if row_abs is None else row_abs
        return q_abs + r_abs + overlap
    ip = jnp.sum(qv_at * val, axis=-1)
    if metric is Metric.IP:
        return -ip
    q_sq = jnp.sum(q_val * q_val)
    r_sq = jnp.sum(val * val, axis=-1) if row_sq is None else row_sq
    if metric is Metric.L2:
        return jnp.maximum(q_sq + r_sq - 2.0 * ip, 0.0)
    if metric is Metric.COSINE:
        denom = jnp.sqrt(q_sq * r_sq)
        cos = jnp.where(denom > 0, ip / jnp.where(denom > 0, denom, 1.0), -jnp.inf)
        return 1.0 - cos
    raise ValueError(f"metric {metric} is not a sparse metric")


def sparse_scores_batch(
    metric: Metric,
    q_idx: jnp.ndarray,  # (Q, Pq)
    q_val: jnp.ndarray,  # (Q, Pq)
    idx: jnp.ndarray,
    val: jnp.ndarray,
    row_sq: Optional[jnp.ndarray] = None,
    row_abs: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(Q, N) stored distances for a batch of sparse queries."""
    fn = functools.partial(sparse_scores, metric)
    return jax.vmap(lambda qi, qv: fn(qi, qv, idx, val, row_sq, row_abs))(q_idx, q_val)
