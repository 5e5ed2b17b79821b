"""Device ops — batched distance kernels + tiled top-k (the MXU/VPU
replacement for pgvector's L0 SIMD layer, SURVEY.md §2.1)."""

from .metric import Metric, stored_to_user, NORMALIZED_METRICS
from .distance import (
    dense_scores,
    dense_pair,
    sq_norms,
    pack_bits,
    popcount_rows,
    bit_scores,
    sparse_scores,
    sparse_scores_batch,
    SPARSE_PAD,
)
from .topk import topk_smallest, merge_topk, tiled_topk

__all__ = [
    "Metric",
    "stored_to_user",
    "NORMALIZED_METRICS",
    "dense_scores",
    "dense_pair",
    "sq_norms",
    "pack_bits",
    "popcount_rows",
    "bit_scores",
    "sparse_scores",
    "sparse_scores_batch",
    "SPARSE_PAD",
    "topk_smallest",
    "merge_topk",
    "tiled_topk",
]
