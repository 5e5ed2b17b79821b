"""``halfvec`` — dense float16 vector value type.

Mirrors reference src/halfvec.c (which mirrors vector.c 1:1) with fp16
storage, max 16,000 dimensions (src/halfvec.h:60).  Distance kernels convert
half → float32 and accumulate in f32, matching the reference's F16C path
(src/halfutils.c:46-122, `_mm256_cvtph_ps` + f32 FMA); arithmetic computes
in f32 and narrows back with checked rounding (`Float4ToHalf` overflow error,
src/halfutils.h:244-261).  Norm accumulates in f64 (src/halfvec.c:700-720).

On device the bulk type maps to bfloat16/f16 arrays with f32 MXU
accumulation (see pgvector_tpu.ops).
"""

from __future__ import annotations

import math
import struct
from typing import List, Sequence, Union

import numpy as np

from ..errors import DataException, NumericValueOutOfRange
from . import _scan
from .vector import (
    Vector,
    _check_dim,
    _check_expected_dim,
    _parse_dense_literal,
    _OVERFLOW,
    _UNDERFLOW,
)

HALFVEC_MAX_DIM = 16000  # src/halfvec.h:60


class HalfVec:
    """A single dense fp16 vector value."""

    __slots__ = ("x",)

    type_name = "halfvec"
    max_dim = HALFVEC_MAX_DIM
    dtype = np.float16

    def __init__(self, values: Union[Sequence[float], np.ndarray], *, _checked: bool = False):
        arr = np.asarray(values, dtype=np.float16)
        if arr.ndim != 1:
            raise DataException("array must be 1-D")
        self.x = arr
        if not _checked:
            _check_dim(arr.shape[0], self.type_name, self.max_dim)
            if np.isnan(arr).any():
                raise DataException("NaN not allowed in halfvec")
            if np.isinf(arr).any():
                raise DataException("infinite value not allowed in halfvec")

    @property
    def dim(self) -> int:
        return int(self.x.shape[0])

    def __len__(self) -> int:
        return self.dim

    # -- text I/O (halfvec_in/out — src/halfvec.c:180-330) ----------------
    @classmethod
    def from_text(cls, lit: str, typmod: int = -1) -> "HalfVec":
        values = _parse_dense_literal(lit, cls.type_name, cls.max_dim, cls._narrow)
        _check_dim(len(values), cls.type_name, cls.max_dim)
        _check_expected_dim(typmod, len(values))
        return cls(np.array(values, dtype=np.float16), _checked=True)

    @staticmethod
    def _narrow(val: float, text: str) -> np.floating:
        return _scan.narrow_f16(val, text, "halfvec")

    def to_text(self) -> str:
        return "[" + ",".join(_scan.format_f16(v) for v in self.x) + "]"

    # -- binary I/O (halfvec_recv/send — src/halfvec.c:382-423) -----------
    @classmethod
    def from_binary(cls, data: bytes, typmod: int = -1) -> "HalfVec":
        if len(data) < 4:
            raise DataException("insufficient data")
        dim, unused = struct.unpack_from(">hh", data, 0)
        _check_dim(dim, cls.type_name, cls.max_dim)
        _check_expected_dim(typmod, dim)
        if unused != 0:
            raise DataException(f"expected unused to be 0, not {unused}")
        if len(data) < 4 + 2 * dim:
            raise DataException("insufficient data left in message")
        arr = np.frombuffer(data, dtype=">f2", count=dim, offset=4).astype(np.float16)
        return cls(arr)

    def to_binary(self) -> bytes:
        return struct.pack(">hh", self.dim, 0) + self.x.astype(">f2").tobytes()

    # -- distances (half → f32 convert, f32 accumulate; src/halfutils.c) --
    def _f32(self) -> np.ndarray:
        return self.x.astype(np.float32)

    def _check_dims(self, other: "HalfVec") -> None:
        if self.dim != other.dim:
            raise DataException(
                f"different halfvec dimensions {self.dim} and {other.dim}"
            )

    def l2_squared_distance(self, other: "HalfVec") -> float:
        self._check_dims(other)
        d = self._f32() - other._f32()
        return float(np.float32(np.dot(d, d)))

    def l2_distance(self, other: "HalfVec") -> float:
        return math.sqrt(self.l2_squared_distance(other))

    def inner_product(self, other: "HalfVec") -> float:
        self._check_dims(other)
        return float(np.float32(np.dot(self._f32(), other._f32())))

    def negative_inner_product(self, other: "HalfVec") -> float:
        return -self.inner_product(other)

    def cosine_distance(self, other: "HalfVec") -> float:
        self._check_dims(other)
        a, b = self._f32(), other._f32()
        sim = np.float32(np.dot(a, b))
        na = np.float32(np.dot(a, a))
        nb = np.float32(np.dot(b, b))
        with np.errstate(divide="ignore", invalid="ignore"):
            similarity = float(np.float64(sim) / np.sqrt(np.float64(na) * np.float64(nb)))
        if not math.isnan(similarity):
            similarity = min(1.0, max(-1.0, similarity))
        return 1.0 - similarity

    def spherical_distance(self, other: "HalfVec") -> float:
        self._check_dims(other)
        ip = float(np.float32(np.dot(self._f32(), other._f32())))
        ip = min(1.0, max(-1.0, ip))
        return math.acos(ip) / math.pi

    def l1_distance(self, other: "HalfVec") -> float:
        self._check_dims(other)
        return float(np.float32(np.sum(np.abs(self._f32() - other._f32()), dtype=np.float32)))

    # -- norm / normalize (f64 accumulate; src/halfvec.c:700-760) ---------
    def norm(self) -> float:
        a = self.x.astype(np.float64)
        return math.sqrt(float(np.dot(a, a)))

    def l2_normalize(self) -> "HalfVec":
        norm = self.norm()
        if norm > 0:
            with np.errstate(over="ignore"):
                rx = (self.x.astype(np.float64) / norm).astype(np.float16)
            if np.isinf(rx).any():
                raise NumericValueOutOfRange(_OVERFLOW)
            return HalfVec(rx, _checked=True)
        return HalfVec(np.zeros_like(self.x), _checked=True)

    # -- checked arithmetic (f32 compute, narrow back; src/halfvec.c:764-906)
    def _narrow_back(self, rx32: np.ndarray) -> "HalfVec":
        with np.errstate(over="ignore"):
            rx = rx32.astype(np.float16)
        if np.isinf(rx).any():
            raise NumericValueOutOfRange(_OVERFLOW)
        return HalfVec(rx, _checked=True)

    def __add__(self, other: "HalfVec") -> "HalfVec":
        self._check_dims(other)
        return self._narrow_back(self._f32() + other._f32())

    def __sub__(self, other: "HalfVec") -> "HalfVec":
        self._check_dims(other)
        return self._narrow_back(self._f32() - other._f32())

    def __mul__(self, other: "HalfVec") -> "HalfVec":
        self._check_dims(other)
        with np.errstate(under="ignore"):
            rx32 = self._f32() * other._f32()
        result = self._narrow_back(rx32)
        if ((result.x == 0) & (self.x != 0) & (other.x != 0)).any():
            raise NumericValueOutOfRange(_UNDERFLOW)
        return result

    def concat(self, other: "HalfVec") -> "HalfVec":
        dim = self.dim + other.dim
        _check_dim(dim, self.type_name, self.max_dim)
        return HalfVec(np.concatenate([self.x, other.x]), _checked=True)

    def binary_quantize(self) -> np.ndarray:
        """halfvec binary_quantize (src/halfvec.c:908-934)."""
        return self.x > 0

    def subvector(self, start: int, count: int) -> "HalfVec":
        if count < 1:
            raise DataException("halfvec must have at least 1 dimension")
        if start > self.dim - count:
            end = self.dim + 1
        else:
            end = start + count
        if start < 1:
            start = 1
        elif start > self.dim:
            raise DataException("halfvec must have at least 1 dimension")
        dim = end - start
        _check_dim(dim, self.type_name, self.max_dim)
        return HalfVec(self.x[start - 1: start - 1 + dim].copy(), _checked=True)

    # -- ordering (src/halfvec.c:1013-1104) -------------------------------
    def compare(self, other: "HalfVec") -> int:
        n = min(self.dim, other.dim)
        a, b = self.x[:n], other.x[:n]
        neq = np.nonzero(a != b)[0]
        if neq.size:
            i = int(neq[0])
            return -1 if a[i] < b[i] else 1
        if self.dim != other.dim:
            return -1 if self.dim < other.dim else 1
        return 0

    def __lt__(self, o): return self.compare(o) < 0
    def __le__(self, o): return self.compare(o) <= 0
    def __eq__(self, o): return isinstance(o, HalfVec) and self.compare(o) == 0
    def __ne__(self, o): return not self.__eq__(o)
    def __ge__(self, o): return self.compare(o) >= 0
    def __gt__(self, o): return self.compare(o) > 0

    def __hash__(self) -> int:
        # x + 0.0 maps -0.0 to +0.0: __eq__ treats them equal (float
        # compare), so their hashes must match too
        return hash((self.type_name, (self.x + 0.0).tobytes()))

    def __repr__(self) -> str:
        return f"HalfVec({self.to_text()!r})"

    # -- casts (src/halfvec.c halfvec↔vector; sql/vector.sql:688-710) -----
    def to_vector(self) -> Vector:
        return Vector(self.x.astype(np.float32), _checked=True)

    @classmethod
    def from_vector(cls, v: Vector) -> "HalfVec":
        with np.errstate(over="ignore"):
            rx = v.x.astype(np.float16)
        if np.isinf(rx).any():
            raise NumericValueOutOfRange(f'"{v.x[np.isinf(rx)][0]}" is out of range for type halfvec')
        return cls(rx, _checked=True)

    def to_numpy(self) -> np.ndarray:
        return self.x

    def tolist(self) -> List[float]:
        return [float(v) for v in self.x]
