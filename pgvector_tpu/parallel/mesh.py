"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "shard") -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` devices.  The single
    axis shards table rows / posting ranges; queries replicate."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh2(n_shards: int, n_replicas: int = 1, axis: str = "shard",
               qaxis: str = "qp") -> Mesh:
    """A 2-D (row-shard × query-replica) mesh: graph/posting arrays shard
    over ``axis`` and replicate over ``qaxis``; the query batch shards over
    ``qaxis``.  This is the serving fan-out topology — the reference scales
    read QPS by adding backends/replicas against the same index
    (test/t/016_hnsw_concurrent.pl pgbench clients; streaming replicas,
    test/t/001_wal.pl), which maps here to data-parallel queries over
    replicated device state, with per-query work unchanged."""
    devs = jax.devices()[: n_shards * n_replicas]
    if len(devs) < n_shards * n_replicas:
        raise ValueError(
            f"mesh needs {n_shards * n_replicas} devices, have {len(devs)}")
    return Mesh(np.array(devs).reshape(n_shards, n_replicas), (axis, qaxis))


def shard_rows(n: int, n_shards: int) -> list:
    """Contiguous row ranges per shard, balanced to ±1."""
    base = n // n_shards
    extra = n % n_shards
    out = []
    start = 0
    for s in range(n_shards):
        size = base + (1 if s < extra else 0)
        out.append((start, start + size))
        start += size
    return out
