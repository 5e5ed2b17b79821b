"""pgvector_tpu — a TPU-native vector index-and-query engine with the
capabilities of pgvector (reference: pgvector/pgvector 0.8.6).

Built from scratch on JAX/XLA/Pallas: vectors, HNSW neighbor arrays, and
IVF posting lists are HBM-resident padded arrays; the hot loops (beam-search
frontiers, k-means, probe scans, top-k) are batched MXU/VPU kernels; scale-out
is a `jax.sharding.Mesh` with per-shard top-k merged over ICI.

Public surface (the analogue of sql/vector.sql):

- types: Vector, HalfVec, SparseVec, Bit
- distance functions for every type x metric combo (pgvector_tpu.ops)
- Table store + exact search (pgvector_tpu.store, pgvector_tpu.index.flat)
- HNSW + IVFFlat approximate indexes (pgvector_tpu.index)
- config registry with pgvector's GUC names (pgvector_tpu.config)
"""

from .config import config
from .errors import (
    VectorError,
    DataException,
    InvalidTextRepresentation,
    ProgramLimitExceeded,
    NumericValueOutOfRange,
    InvalidParameterValue,
    FeatureNotSupported,
    InternalError,
)
from .types import (
    Vector,
    HalfVec,
    SparseVec,
    Bit,
    VectorAggState,
    avg,
    vec_sum,
    VECTOR_MAX_DIM,
    HALFVEC_MAX_DIM,
    SPARSEVEC_MAX_DIM,
    SPARSEVEC_MAX_NNZ,
    BITVEC_MAX_DIM,
)

from .ops.metric import Metric

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy heavyweight imports so ``import pgvector_tpu`` stays light."""
    if name == "Relation":
        from .relation import Relation

        return Relation
    if name == "FlatIndex":
        from .index.flat import FlatIndex

        return FlatIndex
    if name == "HNSWIndex":
        from .index.hnsw import HNSWIndex

        return HNSWIndex
    if name == "IVFFlatIndex":
        from .index.ivfflat import IVFFlatIndex

        return IVFFlatIndex
    if name in ("DenseTable", "BitTable", "SparseTable"):
        from . import store

        return getattr(store, name)
    raise AttributeError(f"module 'pgvector_tpu' has no attribute {name!r}")

__all__ = [
    "config",
    "Metric",
    "Relation",
    "FlatIndex",
    "HNSWIndex",
    "IVFFlatIndex",
    "DenseTable",
    "BitTable",
    "SparseTable",
    "Vector",
    "HalfVec",
    "SparseVec",
    "Bit",
    "VectorAggState",
    "avg",
    "vec_sum",
    "VectorError",
    "DataException",
    "InvalidTextRepresentation",
    "ProgramLimitExceeded",
    "NumericValueOutOfRange",
    "InvalidParameterValue",
    "FeatureNotSupported",
    "InternalError",
    "VECTOR_MAX_DIM",
    "HALFVEC_MAX_DIM",
    "SPARSEVEC_MAX_DIM",
    "SPARSEVEC_MAX_NNZ",
    "BITVEC_MAX_DIM",
]
