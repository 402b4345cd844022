"""Shared hashing for the companion sketches.

All sketches hash their inputs to uniform 64-bit values with pandas'
deterministic siphash (`pd.util.hash_array`, fixed default hash key) — the
same bytes hash to the same value in every partition, every executor, every
run, which is what makes the distributed merges reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

U64 = np.uint64


def hash64(values: np.ndarray) -> np.ndarray:
    """Uniform, deterministic 64-bit hash of any 1-D array (ints, floats,
    strings/objects)."""
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        return pd.util.hash_array(arr.astype(object), categorize=False).astype(U64)
    return pd.util.hash_array(np.ascontiguousarray(arr), categorize=False).astype(U64)


def rehash(h: np.ndarray, salt: int) -> np.ndarray:
    """Cheap independent re-hash of already-uniform 64-bit values
    (splitmix64-style finalizer with a salt)."""
    x = h.astype(U64) + U64((salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    x ^= x >> U64(30)
    x *= U64(0xBF58476D1CE4E5B9)
    x ^= x >> U64(27)
    x *= U64(0x94D049BB133111EB)
    x ^= x >> U64(31)
    return x
