"""Index access methods — exact (flat), IVFFlat, HNSW."""

from .flat import FlatIndex

__all__ = ["FlatIndex"]
