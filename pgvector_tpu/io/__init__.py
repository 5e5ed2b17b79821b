"""Persistence — versioned checkpoints of tables and indexes (the
WAL/metapage analogue, SURVEY.md §5)."""

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
    "save_table",
    "load_table",
    "save_hnsw",
    "load_hnsw",
    "save_ivfflat",
    "load_ivfflat",
    "MAGIC",
    "FORMAT_VERSION",
]
