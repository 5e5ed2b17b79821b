"""Persistence — versioned checkpoints of tables and indexes (the
WAL/metapage analogue, SURVEY.md §5)."""

from .replication import ReplicationLog, apply_deltas
from .checkpoint import (
    save_table,
    load_table,
    save_hnsw,
    load_hnsw,
    save_ivfflat,
    load_ivfflat,
    MAGIC,
    FORMAT_VERSION,
)

__all__ = [
    "ReplicationLog",
    "apply_deltas",
    "save_table",
    "load_table",
    "save_hnsw",
    "load_hnsw",
    "save_ivfflat",
    "load_ivfflat",
    "MAGIC",
    "FORMAT_VERSION",
]
