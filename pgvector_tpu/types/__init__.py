"""Value types — the TPU-native analogue of pgvector's L1 type layer.

Four types, mirroring reference sql/vector.sql:33-42 (vector), :477-486
(halfvec), :942-951 (sparsevec) and the built-in ``bit``:

- :class:`Vector` — dense fp32 (src/vector.c)
- :class:`HalfVec` — dense fp16 (src/halfvec.c)
- :class:`SparseVec` — sparse fp32 (src/sparsevec.c)
- :class:`Bit` — packed bit string (src/bitvec.c)

These are host-side scalar values (parse/format/validate/compare — the
fmgr-call analogue).  Batched device storage and kernels live in
:mod:`pgvector_tpu.store` and :mod:`pgvector_tpu.ops`.
"""

from .vector import Vector, VectorAggState, avg, vec_sum, VECTOR_MAX_DIM
from .halfvec import HalfVec, HALFVEC_MAX_DIM
from .sparsevec import SparseVec, SPARSEVEC_MAX_DIM, SPARSEVEC_MAX_NNZ
from .bitvec import Bit, BITVEC_MAX_DIM

__all__ = [
    "Vector",
    "HalfVec",
    "SparseVec",
    "Bit",
    "VectorAggState",
    "avg",
    "vec_sum",
    "VECTOR_MAX_DIM",
    "HALFVEC_MAX_DIM",
    "SPARSEVEC_MAX_DIM",
    "SPARSEVEC_MAX_NNZ",
    "BITVEC_MAX_DIM",
]
