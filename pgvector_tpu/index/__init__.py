"""Index access methods — exact (flat), IVFFlat, HNSW, ordered (btree)."""

from .btree import OrderedIndex
from .flat import FlatIndex

__all__ = ["FlatIndex", "OrderedIndex"]
