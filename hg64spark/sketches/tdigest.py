"""t-digest quantile sketch (Dunning & Ertl, the merging variant).

Complements KLL/hg64: rank error shrinks toward the tails (the k1 scale
function concentrates centroid resolution at q -> 0/1), where hg64 bounds
value error and KLL bounds uniform rank error.  Like KLL, merging is
associative only in distribution; answers stay within the accuracy envelope
under arbitrary merge orders (asserted by tests).

Implementation: buffered merging digest — values accumulate in a buffer and
are folded into the centroid list by a single sorted sweep that closes a
centroid when its k-size (k1 scale, delta compression) would exceed 1.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from hg64spark import serde

TYPE_TDIGEST = serde.TYPE_TDIGEST


def _k1(q: np.ndarray | float, delta: float):
    return delta / (2.0 * math.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


class TDigest:
    __slots__ = ("delta", "means", "weights", "_buf", "vmin", "vmax", "n")

    def __init__(self, delta: int = 100):
        if not 10 <= delta <= 10000:
            raise ValueError(f"t-digest delta must be in [10, 10000], got {delta}")
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.int64)
        self._buf: list[tuple[np.ndarray, np.ndarray]] = []
        self.vmin = math.inf
        self.vmax = -math.inf
        self.n = 0

    # ------------------------------------------------------------- protocol

    def add_values(self, values: np.ndarray, weights=None) -> "TDigest":
        """Ingest, optionally weighted: an integer weight w enters the buffer
        as a single w-weight point, matching hg64's ``add(value, inc)``
        (`/root/reference/hg64.c:251-254`).  The point carries the same total
        mass as w repeat inserts and an identical mean contribution, but is
        one unsplittable centroid: near the tails, where the k1 bound would
        split w repeats across several centroids, interpolation can differ —
        the accuracy claim for weighted ingest is the bound gate, not
        stream-equivalence."""
        values = np.asarray(values, dtype=np.float64)
        if values.size == 0:
            return self
        if weights is None:
            w = np.ones(values.size, dtype=np.int64)
        else:
            w = np.asarray(weights)
            if w.dtype.kind == "f":
                if not bool(np.isfinite(w).all()) or bool((np.mod(w, 1) != 0).any()):
                    raise ValueError("t-digest weights must be non-negative integers")
            w = w.astype(np.int64)
            if w.shape != values.shape:
                raise ValueError("weights must match values shape")
            if bool((w < 0).any()):
                raise ValueError("t-digest weights must be non-negative")
            keep = w > 0
            values, w = values[keep], w[keep]
            if values.size == 0:
                return self
        self._buf.append((values, w))
        self.n += int(w.sum())
        self.vmin = min(self.vmin, float(values.min()))
        self.vmax = max(self.vmax, float(values.max()))
        if sum(v.size for v, _ in self._buf) >= 20 * self.delta:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("cannot merge t-digests with different delta")
        self._compress()
        other._compress()
        if other.means.size:
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
            self._compress(force=True)
        self.n += other.n
        if other.n:
            self.vmin = min(self.vmin, other.vmin)
            self.vmax = max(self.vmax, other.vmax)
        return self

    def _compress(self, force: bool = False) -> None:
        if self._buf:
            bvals = np.concatenate([v for v, _ in self._buf])
            bw = np.concatenate([w for _, w in self._buf])
            self._buf = []
            all_means = np.concatenate([self.means, bvals])
            all_w = np.concatenate([self.weights, bw])
        elif force:
            all_means, all_w = self.means, self.weights
        else:
            return
        if all_means.size == 0:
            return
        order = np.argsort(all_means, kind="stable")
        m = all_means[order]
        w = all_w[order]
        total = float(w.sum())
        out_m: list[float] = []
        out_w: list[int] = []
        cur_m, cur_w = m[0], int(w[0])
        w_so_far = 0.0
        k_lo = _k1(0.0, self.delta)
        for i in range(1, m.size):
            q_hi = (w_so_far + cur_w + w[i]) / total
            if _k1(q_hi, self.delta) - k_lo <= 1.0:
                cur_m = (cur_m * cur_w + m[i] * w[i]) / (cur_w + w[i])
                cur_w += int(w[i])
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                k_lo = _k1(w_so_far / total, self.delta)
                cur_m, cur_w = m[i], int(w[i])
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m, dtype=np.float64)
        self.weights = np.asarray(out_w, dtype=np.int64)

    # -------------------------------------------------------------- queries

    def value_at_quantile(self, qs) -> np.ndarray:
        self._compress()
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64)).clip(0.0, 1.0)
        if self.means.size == 0:
            return np.full(qs.shape, np.nan)
        w = self.weights.astype(np.float64)
        cum = np.cumsum(w) - w / 2.0  # centroid centers in rank space
        targets = qs * self.n
        out = np.interp(targets, cum, self.means)
        out = np.where(targets <= cum[0], np.interp(targets, [0.0, cum[0]], [self.vmin, self.means[0]]), out)
        out = np.where(
            targets >= cum[-1],
            np.interp(targets, [cum[-1], float(self.n)], [self.means[-1], self.vmax]),
            out,
        )
        return out

    def rank_of_value(self, values) -> np.ndarray:
        """Approximate count of items <= value (centroid interpolation)."""
        self._compress()
        values = np.atleast_1d(np.asarray(values, dtype=np.float64))
        if self.means.size == 0:
            return np.zeros(values.shape)
        w = self.weights.astype(np.float64)
        cum = np.cumsum(w) - w / 2.0
        xs = np.concatenate([[self.vmin], self.means, [self.vmax]])
        ys = np.concatenate([[0.0], cum, [float(self.n)]])
        return np.interp(values, xs, ys)

    # ----------------------------------------------------------------- serde

    def serialize(self) -> bytes:
        self._compress()
        header = struct.pack("<IQdd", self.delta, self.n, self.vmin, self.vmax)
        payload = (
            struct.pack("<I", self.means.size)
            + self.means.astype("<f8").tobytes()
            + self.weights.astype("<i8").tobytes()
        )
        return serde.pack(TYPE_TDIGEST, header, payload)

    @classmethod
    def deserialize(cls, buf: bytes) -> "TDigest":
        _, header, payload = serde.expect(buf, TYPE_TDIGEST)
        if len(header) != 28:
            raise ValueError("corrupt t-digest header")
        delta, n, vmin, vmax = struct.unpack("<IQdd", header)
        (k,) = struct.unpack_from("<I", payload, 0)
        if len(payload) < 4 + 16 * k:
            raise ValueError("corrupt t-digest payload")
        means = np.frombuffer(payload, dtype="<f8", count=k, offset=4)
        weights = np.frombuffer(payload, dtype="<i8", count=k, offset=4 + 8 * k)
        # invariant checks (mirroring the MG path): a well-framed blob whose
        # content breaks the digest invariants must not load into a sketch
        # whose rank space is silently non-monotonic or mis-normalized
        if k:
            if not bool(np.isfinite(means).all()):
                raise ValueError("corrupt t-digest payload: non-finite centroid mean")
            if bool((weights <= 0).any()):
                raise ValueError("corrupt t-digest payload: non-positive centroid weight")
            if bool((np.diff(means) < 0).any()):
                raise ValueError("corrupt t-digest payload: centroid means not sorted")
            if int(weights.sum()) != n:
                raise ValueError("corrupt t-digest payload: weights do not sum to n")
            if not (vmin <= float(means[0]) and float(means[-1]) <= vmax):
                raise ValueError("corrupt t-digest payload: vmin/vmax do not bracket centroids")
        elif n != 0:
            raise ValueError("corrupt t-digest payload: n > 0 with no centroids")
        out = cls(delta)
        out.means = means.astype(np.float64)
        out.weights = weights.astype(np.int64)
        out.n = n
        out.vmin = vmin
        out.vmax = vmax
        return out
