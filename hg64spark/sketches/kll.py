"""KLL rank/quantile sketch (Karnin, Lang, Liberty 2016).

Complements hg64: hg64 bounds *value* error (2^-sigbits relative bucket
width); KLL bounds *rank* error (~1.65% of N at k=200, the figure published
for Apache DataSketches' KLL at that k).  Cross-checked against hg64 and
exact quantiles in the test suite, and against ``percentile_approx`` in the
pipeline tests.

Merge is level-wise concatenation + re-compaction.  KLL is a *randomized*
sketch: unlike hg64/HLL/CMS/Bloom, its merge is associative only in
distribution — different partition splits give different (all valid) sketches
whose answers stay within the published rank-error bound.  Compaction
randomness is drawn per sketch from the level contents PLUS the Spark
partition id (so equal-content partials on different partitions flip
independent coins, as the error proof assumes); consequence: KLL outputs are
*bound-gated*, not bit-reproducible across partitionings — pass an explicit
``seed`` where bit reproducibility matters more than independence.

Weighted ingest (hg64's ``add(value, inc)``, `/root/reference/hg64.c:251-254`)
decomposes each integer weight in binary and inserts the value directly at
level b for every set bit b (level-b items carry weight 2^b) — exactly the
repeat-insert stream without materializing it.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

from hg64spark import serde

_C = 2.0 / 3.0

#: ingest chunk size — measured sweep (262k-row Arrow batch / 4M-row array,
#: KLL(200), this box): capacity-sized chunks (~600) cost 163 ns/row (Python
#: loop overhead dominates), monolithic costs 28 ns/row on 262k but blows up
#: to 169 ns/row on 4M rows (each compaction re-sorts the whole level-0);
#: 64k chunks hit ~27 ns/row on 262k AND ~25 ns/row on 4M — the knee.
_INGEST_CHUNK = 65_536


def _partition_component() -> int:
    """Spark partition id when running inside a task, else -1 — mixed into
    lazily-derived compaction seeds so equal-content partials on different
    partitions draw independent coin streams."""
    try:
        from pyspark import TaskContext

        tc = TaskContext.get()
        return -1 if tc is None else int(tc.partitionId())
    except Exception:
        return -1


class KLL:
    __slots__ = ("k", "levels", "n", "_rng", "_seed")

    def __init__(
        self, k: int = 200, levels: list[np.ndarray] | None = None, n: int = 0, seed: int | None = None
    ):
        if not 8 <= k <= 65535:
            raise ValueError(f"KLL k must be in [8, 65535], got {k}")
        if seed is not None and not 0 <= seed < (1 << 64) - 1:
            # 2^64-1 is the wire sentinel for "no explicit seed"; negatives
            # would silently alias into it through the serde mask
            raise ValueError(f"KLL seed must be in [0, 2^64-2], got {seed}")
        self.k = k
        self.levels = levels if levels is not None else [np.empty(0, dtype=np.float64)]
        self.n = n
        # the KLL error proof assumes INDEPENDENT compaction coin flips across
        # sketch instances; a constant seed correlates every partial sketch's
        # even/odd promotion choices.  Seed lazily from the first data the
        # sketch compacts (deterministic for a given execution order, i.e.
        # reproducible, but decorrelated across partitions), or from an
        # explicit ``seed``.
        self._seed = seed
        self._rng = None

    def _coin(self) -> int:
        if self._rng is None:
            if self._seed is not None:
                s = self._seed
            else:
                # mix up to 16 values from EVERY level (level 0 can be empty
                # right after a merge of compacted partials, and clustered
                # data can share a level-0 prefix — either would degenerate a
                # level-0-only seed to a function of n alone) PLUS a
                # partition-unique component: identical data prefixes across
                # partitions (near-constant columns) would otherwise
                # re-correlate the coin streams the KLL error proof assumes
                # independent.  Inside a Spark task that component is the
                # partition id (deterministic for a given partitioning); on
                # the driver it is -1.  Consequence, documented in the module
                # docstring: KLL outputs are bound-gated, not bit-reproducible
                # across different partitionings.
                crc = self.n & 0xFFFFFFFF
                crc = zlib.crc32(_partition_component().to_bytes(8, "little", signed=True), crc)
                for lv in self.levels:
                    if lv.size:
                        crc = zlib.crc32(np.ascontiguousarray(lv[:16], dtype=np.float64).tobytes(), crc)
                    crc = zlib.crc32(lv.size.to_bytes(8, "little"), crc)
                s = crc
            self._rng = np.random.default_rng((s << 17) ^ 0xD1CE ^ self.k)
        return int(self._rng.integers(2))

    # ------------------------------------------------------------- internals

    def _cap(self, h: int, n_levels: int) -> int:
        return max(2, int(math.ceil(self.k * _C ** (n_levels - 1 - h))))

    def _total_cap(self, n_levels: int) -> int:
        return sum(self._cap(h, n_levels) for h in range(n_levels))

    def _size(self) -> int:
        return sum(lv.size for lv in self.levels)

    def _compress(self) -> None:
        while self._size() > self._total_cap(len(self.levels)):
            for h in range(len(self.levels)):
                lv = self.levels[h]
                if lv.size > self._cap(h, len(self.levels)):
                    lv = np.sort(lv)
                    if lv.size % 2 == 1:
                        keep, lv = lv[-1:], lv[:-1]
                    else:
                        keep = np.empty(0, dtype=np.float64)
                    offset = self._coin()
                    promoted = lv[offset::2]
                    self.levels[h] = keep
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
                    break
            else:
                break

    # -------------------------------------------------------------- protocol

    def add_values(self, values: np.ndarray, weights=None) -> "KLL":
        if weights is not None:
            return self._add_weighted(values, weights)
        values = np.asarray(values, dtype=np.float64)
        if values.size == 0:
            return self
        # chunked ingest bounds the per-compaction sort for huge arrays (a
        # monolithic 4M-row concat makes every level-0 compaction re-sort
        # millions of rows: measured 169 ns/row vs 25 chunked) while the
        # chunk stays large enough that numpy, not the Python compaction
        # loop, dominates (capacity-sized chunks measured 6x slower) —
        # sweep numbers at _INGEST_CHUNK
        chunk = max(_INGEST_CHUNK, self._total_cap(len(self.levels)))
        for lo in range(0, values.size, chunk):
            part = values[lo : lo + chunk]
            self.levels[0] = np.concatenate([self.levels[0], part])
            self.n += part.size
            self._compress()
        return self

    def _add_weighted(self, values: np.ndarray, weights) -> "KLL":
        """Integer-weighted ingest matching hg64's ``add(value, inc)``
        (`/root/reference/hg64.c:251-254`): a weight w decomposes in binary
        and the value is inserted once per set bit b directly at level b
        (where items carry weight 2^b) — carries the same total weight as w
        repeat inserts without materializing them (repeat inserts would
        additionally pass through level-0 compaction coins, so the two are
        weight-equivalent, not distribution-identical; the gates check the
        rank bound, which holds for both).  Zero weights are no-ops,
        negative weights rejected."""
        values = np.asarray(values, dtype=np.float64)
        w = np.asarray(weights)
        if w.dtype.kind == "f":
            if not bool(np.isfinite(w).all()) or bool((np.mod(w, 1) != 0).any()):
                raise ValueError("KLL weights must be non-negative integers")
        w = w.astype(np.int64)
        if w.shape != values.shape:
            raise ValueError("weights must match values shape")
        if bool((w < 0).any()):
            raise ValueError("KLL weights must be non-negative")
        if values.size == 0 or not bool((w > 0).any()):
            return self
        total = int(w.sum())
        maxbit = int(w.max()).bit_length()
        for b in range(maxbit):
            sel = values[(w >> b) & 1 == 1]
            if not sel.size:
                continue
            while len(self.levels) <= b:
                self.levels.append(np.empty(0, dtype=np.float64))
            # chunk like the unweighted path so one huge weighted batch
            # can't force an O(batch) sort in a single compaction
            chunk = max(_INGEST_CHUNK, self._total_cap(len(self.levels)))
            for lo in range(0, sel.size, chunk):
                self.levels[b] = np.concatenate([self.levels[b], sel[lo : lo + chunk]])
                self._compress()
        self.n += total
        return self

    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self._compress()
        return self

    # --------------------------------------------------------------- queries

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items = []
        weights = []
        for h, lv in enumerate(self.levels):
            if lv.size:
                items.append(lv)
                weights.append(np.full(lv.size, 1 << h, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def value_at_quantile(self, qs) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64)).clip(0.0, 1.0)
        it, wt = self._weighted()
        if it.size == 0:
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(wt)
        ranks = np.minimum(np.floor(qs * self.n), self.n - 1)
        idx = np.searchsorted(cum, ranks, side="right")
        return it[np.minimum(idx, it.size - 1)]

    def rank_of_value(self, values) -> np.ndarray:
        """Estimated number of items <= value."""
        values = np.atleast_1d(np.asarray(values, dtype=np.float64))
        it, wt = self._weighted()
        if it.size == 0:
            return np.zeros(values.shape, dtype=np.int64)
        cum = np.concatenate([[0], np.cumsum(wt)])
        idx = np.searchsorted(it, values, side="right")
        return cum[idx]

    @staticmethod
    def rank_error_bound(k: int = 200) -> float:
        """Published normalized rank error at 99% confidence for KLL with
        c=2/3 (DataSketches figure for k=200 is ~1.65%); scales as O(1/k)."""
        return 1.65 / 200.0 * (200.0 / k)

    # ----------------------------------------------------------------- serde

    _NO_SEED = (1 << 64) - 1  # header sentinel: data-derived (lazy) seeding

    def serialize(self) -> bytes:
        # the explicit seed travels in the header so KLL(k, seed=s) keeps its
        # coin stream through the library's serialize->merge Spark path
        seed = self._NO_SEED if self._seed is None else self._seed
        header = struct.pack("<HIQQ", self.k, len(self.levels), self.n, seed)
        parts = []
        for lv in self.levels:
            parts.append(struct.pack("<I", lv.size))
            parts.append(lv.astype("<f8").tobytes())
        return serde.pack(serde.TYPE_KLL, header, b"".join(parts))

    @classmethod
    def deserialize(cls, buf: bytes) -> "KLL":
        _, header, payload = serde.expect(buf, serde.TYPE_KLL)
        if len(header) == 22:
            k, n_levels, n, seed = struct.unpack("<HIQQ", header)
        elif len(header) == 14:
            # legacy layout (pre-seed): valid v1 blobs must load, not be
            # reported as corruption
            k, n_levels, n = struct.unpack("<HIQ", header)
            seed = cls._NO_SEED
        else:
            raise ValueError("corrupt KLL header")
        levels = []
        off = 0
        for _ in range(n_levels):
            if off + 4 > len(payload):
                raise ValueError("corrupt KLL payload")
            (sz,) = struct.unpack_from("<I", payload, off)
            off += 4
            end = off + sz * 8
            if end > len(payload):
                raise ValueError("corrupt KLL payload")
            levels.append(np.frombuffer(payload, dtype="<f8", count=sz, offset=off).astype(np.float64))
            off = end
        # invariant: total item weight equals n EXACTLY — inserts add weight-1
        # (or 2^b for weighted) items, and compaction preserves total weight
        # (2m weight-2^h items become m weight-2^(h+1) items; the odd keeper
        # stays).  A crafted blob violating it would silently mis-normalize
        # every quantile answer.
        if sum(lv.size << h for h, lv in enumerate(levels)) != n:
            raise ValueError("corrupt KLL payload: level weights do not sum to n")
        if any(lv.size and not bool(np.isfinite(lv).all()) for lv in levels):
            raise ValueError("corrupt KLL payload: non-finite item")
        return cls(k, levels, n, seed=None if seed == cls._NO_SEED else seed)
