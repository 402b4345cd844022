"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the standard
small-range linear-counting correction).

Merge = elementwise register max — exactly associative and commutative, like
the hg64 counter add.  Published error: sigma = 1.04 / sqrt(m); the test
suite asserts |est - exact| <= 3 sigma * exact.  Cross-validated against
Spark's built-in ``approx_count_distinct`` in the pipeline tests.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from hg64spark import serde
from hg64spark.keymath import floor_log2_u64
from hg64spark.sketches.common import U64, hash64


HASH_SIPHASH = 0  # pandas siphash — the Python/Arrow ingest path
HASH_XXHASH64 = 1  # Spark xxhash64 — the relational (pure-Catalyst) path


class HLL:
    __slots__ = ("p", "m", "registers", "hash_family")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None, hash_family: int = HASH_SIPHASH):
        if not 4 <= p <= 18:
            raise ValueError(f"HLL precision p must be in [4, 18], got {p}")
        self.p = p
        self.m = 1 << p
        self.hash_family = hash_family
        if registers is None:
            self.registers = np.zeros(self.m, dtype=np.uint8)
        else:
            registers = np.asarray(registers, dtype=np.uint8)
            if registers.shape != (self.m,):
                raise ValueError("register array shape mismatch")
            self.registers = registers

    def add_values(self, values: np.ndarray, weights=None) -> "HLL":
        """Vectorized update: idx = top p bits, rho = 1 + #leading zeros of
        the remaining bits.  (weights are ignored — distinctness is
        weight-free.)"""
        if len(values) == 0:
            return self
        h = hash64(values)
        idx = (h >> U64(64 - self.p)).astype(np.int64)
        w = h << U64(self.p)  # remaining 64-p bits, top-aligned
        # clz(w) for w>0 is 63 - floor_log2; w == 0 means all remaining bits
        # zero -> rho saturates at 64 - p + 1
        nz = w != U64(0)
        rho = np.full(h.shape, 64 - self.p + 1, dtype=np.uint8)
        if nz.any():
            rho[nz] = (U64(64) - floor_log2_u64(w[nz]) - U64(1) + U64(1)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError(f"cannot merge HLL p={other.p} into p={self.p}")
        if other.hash_family != self.hash_family:
            raise ValueError(
                f"cannot merge HLLs from different hash families "
                f"({self.hash_family} vs {other.hash_family})"
            )
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def union(self, other: "HLL") -> "HLL":
        """Non-mutating merge: the HLL of A ∪ B (register max) — EXACT set
        algebra for HLL (the union sketch is identical to one built from
        the concatenated streams), unlike intersection which is only
        estimable (below)."""
        return HLL(self.p, self.registers.copy(), self.hash_family).merge(other)

    @staticmethod
    def intersection_estimate(a: "HLL", b: "HLL") -> float:
        """|A ∩ B| by inclusion-exclusion over three HLL estimates:
        |A| + |B| - |A ∪ B|, clamped at 0.  No intersection SKETCH exists
        for HLL (register min is not the intersection's sketch — a shared
        register can be owned by different items in A and B), so this is
        an estimate of an estimate: absolute error is bounded by the sum
        of the three estimates' errors, sigma * (|A| + |B| + |A∪B|) per
        standard deviation (conservative — the three share one hash
        function, so their errors are positively correlated and partially
        cancel).  Relative error explodes as the true intersection shrinks
        relative to the union: right for 'how much do these groups'
        audiences overlap', wrong for needle-size intersections."""
        u = a.union(b)
        return max(a.estimate() + b.estimate() - u.estimate(), 0.0)

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / float(np.sum(np.float64(2.0) ** (-self.registers.astype(np.float64))))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros > 0:
                est = m * math.log(m / zeros)  # linear counting
        return est

    @staticmethod
    def error_bound(p: int = 14) -> float:
        """Published relative standard error: 1.04/sqrt(m)."""
        return 1.04 / math.sqrt(1 << p)

    def serialize(self) -> bytes:
        header = struct.pack("<BB", self.p, self.hash_family)
        return serde.pack(serde.TYPE_HLL, header, self.registers.tobytes())

    @classmethod
    def deserialize(cls, buf: bytes) -> "HLL":
        _, header, payload = serde.expect(buf, serde.TYPE_HLL)
        if len(header) != 2:
            raise ValueError("corrupt HLL header")
        p, fam = struct.unpack("<BB", header)
        regs = np.frombuffer(payload, dtype=np.uint8)
        return cls(p, regs.copy(), hash_family=fam)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, HLL)
            and self.p == other.p
            and self.hash_family == other.hash_family
            and bool(np.array_equal(self.registers, other.registers))
        )
