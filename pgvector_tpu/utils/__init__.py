"""Utilities: observability (timers/progress/memory accounting)."""

from .telemetry import (
    timers,
    Timers,
    Progress,
    hbm_bytes,
    table_hbm_bytes,
    hnsw_hbm_bytes,
    ivfflat_hbm_bytes,
    HNSW_PHASES,
    IVFFLAT_PHASES,
)

__all__ = [
    "timers",
    "Timers",
    "Progress",
    "hbm_bytes",
    "table_hbm_bytes",
    "hnsw_hbm_bytes",
    "ivfflat_hbm_bytes",
    "HNSW_PHASES",
    "IVFFLAT_PHASES",
]
