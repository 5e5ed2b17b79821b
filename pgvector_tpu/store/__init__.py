"""Storage layer — HBM-resident padded tables (the heap-page replacement)."""

from .table import DenseTable, BitTable, SparseTable, BaseTable

__all__ = ["DenseTable", "BitTable", "SparseTable", "BaseTable"]
