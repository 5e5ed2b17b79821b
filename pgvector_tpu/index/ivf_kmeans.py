"""K-means center training for IVFFlat — the MXU rewrite of
src/ivfkmeans.c.

The reference uses k-means++ seeding (ivfkmeans.c:23-91) followed by
Elkan's triangle-inequality-accelerated Lloyd's with a 500-iteration cap
(ivfkmeans.c:246-485).  Elkan's bound bookkeeping is a scalar-CPU trick to
*skip* distance evaluations; on the MXU the full samples×centers distance
matrix per iteration is a single matmul, so plain Lloyd's is both simpler
and faster (SURVEY.md §7 M2).  Preserved semantics:

- k-means++ D² seeding,
- ≤500 iterations with early exit on unchanged assignments,
- empty-cluster random reseed (ivfkmeans.c:222-227),
- spherical variant for IP/cosine: assignment by angular order (argmax ip)
  and centers re-normalized every round (NormCenters ivfkmeans.c:96-105),
- binary variant for bit: centers thresholded at 0.5 every round (the
  updateCenter hook, src/ivfutils.c:282-423),
- post-checks: no NaN/Inf centers, no zero-norm centers for spherical
  (ivfkmeans.c:490-547).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..errors import InternalError

KMEANS_MAX_ITERATIONS = 500  # ivfkmeans.c:347


def _assign(data: jnp.ndarray, centers: jnp.ndarray, spherical: bool) -> jnp.ndarray:
    """Nearest-center ids via one MXU matmul.  L2 ordering uses
    ||c||² - 2 x·c (the x² term is constant per row); spherical ordering is
    argmax ip (acos is monotone, ivfkmeans.c KMEANS_DISTANCE)."""
    ip = jax.lax.dot_general(
        data, centers,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # TPU default bf16 scrambles near-tie assignments
    )
    if spherical:
        return jnp.argmax(ip, axis=1).astype(jnp.int32)
    c_sq = jnp.sum(centers * centers, axis=1)
    return jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=1).astype(jnp.int32)


def _new_centers(
    data: jnp.ndarray, assign: jnp.ndarray, k: int, key: jnp.ndarray,
    spherical: bool, binary: bool,
) -> jnp.ndarray:
    """Mean of members per cluster (ComputeNewCenters ivfkmeans.c:179-236);
    empty clusters reseed from a random sample (:222-227)."""
    n = data.shape[0]
    one_hot_sum = jax.ops.segment_sum(data, assign, num_segments=k)
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), assign, num_segments=k)
    centers = one_hot_sum / jnp.maximum(counts, 1.0)[:, None]
    # reseed empties with random samples
    rand_rows = jax.random.randint(key, (k,), 0, n)
    centers = jnp.where((counts == 0)[:, None], data[rand_rows], centers)
    if spherical:
        norms = jnp.sqrt(jnp.sum(centers * centers, axis=1, keepdims=True))
        centers = centers / jnp.maximum(norms, 1e-30)
    if binary:
        centers = (centers > 0.5).astype(jnp.float32)
    return centers


@functools.partial(jax.jit, static_argnames=("k", "spherical", "binary"))
def _kmeans_device(
    data: jnp.ndarray, init_centers: jnp.ndarray, key: jnp.ndarray,
    k: int, spherical: bool, binary: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Lloyd's loop as a device while_loop; returns (centers, assign, iters)."""

    def cond(state):
        _, _, changed, it, _ = state
        return jnp.logical_and(changed, it < KMEANS_MAX_ITERATIONS)

    def body(state):
        centers, assign, _, it, key = state
        key, sub = jax.random.split(key)
        new_assign = _assign(data, centers, spherical)
        changed = jnp.any(new_assign != assign)
        centers = _new_centers(data, new_assign, k, sub, spherical, binary)
        return centers, new_assign, changed, it + 1, key

    assign0 = jnp.full((data.shape[0],), -1, jnp.int32)
    centers, assign, _, iters, _ = jax.lax.while_loop(
        cond, body, (init_centers, assign0, jnp.bool_(True), jnp.int32(0), key)
    )
    return centers, assign, iters


@functools.partial(jax.jit, static_argnames=("k", "spherical"))
def _kmeanspp_init(data: jnp.ndarray, key: jnp.ndarray, k: int, spherical: bool) -> jnp.ndarray:
    """k-means++ D² seeding (InitCenters ivfkmeans.c:23-91) as a lax.scan:
    each step samples the next center with probability ∝ current min
    distance, then folds its distances into the running minimum."""
    n = data.shape[0]

    def dist_to(c):
        if spherical:
            ip = jnp.einsum("sd,d->s", data, c,
                            precision=jax.lax.Precision.HIGHEST)
            # angular distance ∝ acos(ip); use (1 - ip) which is monotone
            return jnp.maximum(1.0 - ip, 0.0)
        d = data - c[None, :]
        return jnp.sum(d * d, axis=1)

    key, sub = jax.random.split(key)
    first = data[jax.random.randint(sub, (), 0, n)]
    min_d = dist_to(first)

    def step(carry, step_key):
        min_d, _ = carry
        total = jnp.sum(min_d)
        # guard all-zero weights (duplicate data): fall back to uniform
        probs = jnp.where(total > 0, min_d / jnp.maximum(total, 1e-30),
                          jnp.full_like(min_d, 1.0 / n))
        idx = jax.random.choice(step_key, n, p=probs)
        c = data[idx]
        min_d = jnp.minimum(min_d, dist_to(c))
        return (min_d, c), c

    keys = jax.random.split(key, k - 1) if k > 1 else jnp.zeros((0, 2), jnp.uint32)
    (_, _), rest = jax.lax.scan(step, (min_d, first), keys)
    return jnp.concatenate([first[None, :], rest], axis=0)


def train_centers(
    data: jnp.ndarray,
    k: int,
    *,
    spherical: bool = False,
    binary: bool = False,
    normalize_data: bool = False,
    seed: int = 0,
) -> jnp.ndarray:
    """Full center training: k-means++ seed + Lloyd's.  ``data`` is the
    (pre-normalized, pre-unpacked) sample block, f32.

    Mirrors IvfflatKmeans (ivfkmeans.c:553-569): fewer samples than centers
    → pad by reusing samples (the reference duplicates via RandomCenters
    when the table is tiny, ivfkmeans.c:110-133).
    """
    data = data.astype(jnp.float32)
    n = data.shape[0]
    if n == 0:
        raise InternalError("k-means requires at least one sample")
    key = jax.random.PRNGKey(seed)
    if n < k:
        # tile samples up to k then jitter assignment via random rows
        reps = -(-k // n)
        data_fit = jnp.tile(data, (reps, 1))[: max(k, n)]
        init = data_fit[:k]
        centers = init
        if spherical:
            norms = jnp.sqrt(jnp.sum(centers**2, axis=1, keepdims=True))
            centers = centers / jnp.maximum(norms, 1e-30)
        if binary:
            centers = (centers > 0.5).astype(jnp.float32)
        return centers
    if normalize_data:
        # cosine opclasses index normalized values; IP opclasses train on
        # raw samples with normalized centers (NormCenters only,
        # sql/vector.sql:412-425)
        norms = jnp.sqrt(jnp.sum(data * data, axis=1, keepdims=True))
        data = data / jnp.maximum(norms, 1e-30)
    key, k_init, k_lloyd = jax.random.split(key, 3)
    init = _kmeanspp_init(data, k_init, k, spherical)
    if binary:
        init = (init > 0.5).astype(jnp.float32)
    centers, _, _ = _kmeans_device(data, init, k_lloyd, k, spherical, binary)
    # post-checks (ivfkmeans.c:490-547): finite centers, and no zero-norm
    # centers for the spherical variant
    centers_host = jax.device_get(centers)
    import numpy as np

    if np.isnan(centers_host).any() or np.isinf(centers_host).any():
        raise InternalError("k-means produced non-finite centers. Please report a bug.")
    if spherical:
        norms = np.linalg.norm(centers_host, axis=1)
        if (norms == 0).any():
            raise InternalError(
                "k-means produced a zero-norm center for a spherical metric. Please report a bug."
            )
    return centers
