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
