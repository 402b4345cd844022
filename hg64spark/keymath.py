"""Vectorized hg64 key math: value <-> bucket-key conversion over numpy arrays.

Reproduces the log-linear bucket scheme of the reference
(`/root/reference/hg64.c:156-193`): a key is a 6-bit exponent plus ``sigbits``
mantissa bits, exactly like a floating-point format with denormals.  All
functions here are pure, whole-array numpy (no per-row Python), operating on
``uint64`` end-to-end — the vectorized analogue of the reference's branchless
CLZ conversion (`hg64.c:180-193`, credited to Paul Khuong).

Layout facts (`hg64.c:84-97`):
    BINSIZE  = 2**sigbits                     (counters per bin)
    KEYS     = (64 - sigbits + 1) * BINSIZE   (total key space)
    bin 0 holds the "denormals": keys < BINSIZE map to themselves and the
    buckets are exact (min == max).

Everything is validated exhaustively by ``validate()`` — a port of the
reference's own self-check (`hg64.c:446-469`) — run by the test suite for
sigbits 1..11.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_U64_1 = U64(1)
_U64_63 = U64(63)
# UINT64_MAX / 4  (`hg64.c:172`)
_QMAX = U64((1 << 62) - 1)
_U64_MAX = U64(0xFFFFFFFFFFFFFFFF)

MIN_SIGBITS = 1
MAX_SIGBITS = 15


def check_sigbits(sigbits: int) -> int:
    """Validate the precision knob; reference range 1..15 (`hg64.c:113-115`)."""
    sigbits = int(sigbits)
    if sigbits < MIN_SIGBITS or sigbits > MAX_SIGBITS:
        raise ValueError(f"sigbits must be in [1, 15], got {sigbits}")
    return sigbits


def binsize(sigbits: int) -> int:
    return 1 << sigbits


def nkeys(sigbits: int) -> int:
    """(64 - sigbits + 1) * 2**sigbits  (`hg64.c:91-94`)."""
    return (64 - (sigbits - 1)) * (1 << sigbits)


def floor_log2_u64(x: np.ndarray) -> np.ndarray:
    """Elementwise floor(log2(x)) for uint64 x >= 1, exact.

    numpy 1.26 has no popcount/clz for uint64, so we take the frexp exponent
    of the float64 conversion as a candidate and correct it with integer
    shifts.  float64 conversion rounds to nearest, which can only push the
    candidate one too high (x just below 2**k rounds up to 2**k); the
    integer-shift check repairs it, so the result is exact for the full
    uint64 domain (verified exhaustively around every power of two by
    tests/test_keymath.py).
    """
    x = np.asarray(x, dtype=U64)
    f = x.astype(np.float64)
    # read the IEEE-754 exponent field directly (2x faster than np.frexp)
    e = ((f.view(U64) >> U64(52)) & U64(0x7FF)).astype(np.int64) - 1023
    fl = np.clip(e, 0, 63).astype(U64)
    # round-to-nearest can only push the candidate one too HIGH (x just below
    # 2**k converts to exactly 2**k); x >= 2**k never converts below 2**k
    too_high = (x >> fl) == U64(0)
    return fl - too_high.astype(U64)


def value_to_key(values: np.ndarray, sigbits: int) -> np.ndarray:
    """Vectorized `value_to_key` (`hg64.c:180-193`).

    binned = value | 2**sigbits   (forces denormals into bin 0)
    exponent = floor_log2(binned) - sigbits    ( == 63 - sigbits - clz )
    mantissa = value >> exponent               (leading bit set, except denormals)
    key      = (exponent << sigbits) + mantissa
    """
    values = np.asarray(values, dtype=U64)
    sb = U64(check_sigbits(sigbits))
    binned = values | (_U64_1 << sb)
    exponent = floor_log2_u64(binned) - sb
    mantissa = values >> exponent
    return ((exponent << sb) + mantissa).astype(np.int64)


def key_to_minval(keys: np.ndarray, sigbits: int) -> np.ndarray:
    """Vectorized `key_to_minval` (`hg64.c:156-162`): bucket lower bound.

    Keys below BINSIZE map to themselves (exact unit buckets); otherwise
    mantissa = key % binsize + binsize, exponent = key / binsize - 1,
    minval = mantissa << exponent.  Returns uint64.
    """
    keys = np.asarray(keys, dtype=U64)
    sb = check_sigbits(sigbits)
    bs = U64(binsize(sb))
    exponent = np.where(keys < bs, U64(0), keys // bs - _U64_1).astype(U64)
    mantissa = np.where(keys < bs, keys, keys % bs + bs).astype(U64)
    return mantissa << exponent


def key_to_maxval(keys: np.ndarray, sigbits: int) -> np.ndarray:
    """Vectorized `key_to_maxval` (`hg64.c:164-174`): bucket upper bound.

    range = (UINT64_MAX/4) >> (63 - key/binsize); max = min + range.
    The pre-shifted constant avoids shift-by-64 / exponent underflow exactly
    as the reference does.  Returns uint64 (top bucket's max == UINT64_MAX).
    """
    keys = np.asarray(keys, dtype=U64)
    sb = check_sigbits(sigbits)
    bs = U64(binsize(sb))
    shift = _U64_63 - keys // bs
    rng = _QMAX >> shift
    return key_to_minval(keys, sb) + rng


def interpolate_u64(span: np.ndarray, mul: np.ndarray, div: np.ndarray) -> np.ndarray:
    """Vectorized `interpolate` (`hg64.c:103-107`).

    frac = (div == 0) ? 1 : mul/div  (float64); result = trunc(span * frac)
    as uint64 — C's (uint64_t) cast truncates toward zero, and all operands
    here are non-negative, so trunc == floor.
    """
    span = np.asarray(span, dtype=U64).astype(np.float64)
    mul = np.asarray(mul, dtype=U64).astype(np.float64)
    div = np.asarray(div, dtype=U64).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(div == 0.0, 1.0, mul / div)
    return np.floor(span * frac).astype(U64)


def validate(max_sigbits: int = 11) -> None:
    """Port of `hg64_validate` (`hg64.c:446-469`): exhaustive self-check.

    For every key at every sigbits in 1..max_sigbits, asserts:
      * key <-> bounds round-trip: value_to_key(min) == value_to_key(max) == key
      * bin-0 buckets are exact (min == max)
      * key 0 is the only bucket containing 0; the top bucket ends at 2**64-1
      * buckets are contiguous and gapless over the whole u64 domain
    """
    for sb in range(1, max_sigbits + 1):
        keys = np.arange(nkeys(sb), dtype=np.int64)
        mins = key_to_minval(keys, sb)
        maxs = key_to_maxval(keys, sb)
        assert np.array_equal(value_to_key(mins, sb), keys), f"min round-trip sigbits={sb}"
        assert np.array_equal(value_to_key(maxs, sb), keys), f"max round-trip sigbits={sb}"
        bs = binsize(sb)
        assert np.array_equal(mins[:bs], maxs[:bs]), f"bin0 exact sigbits={sb}"
        assert mins[0] == 0 and maxs[0] == 0, f"zero key sigbits={sb}"
        assert np.all(mins[1:] > U64(0)), f"only key 0 holds 0, sigbits={sb}"
        assert maxs[-1] == _U64_MAX, f"top bucket ends at u64 max, sigbits={sb}"
        assert np.all(maxs[:-1] != _U64_MAX), f"only top bucket ends at max, sigbits={sb}"
        assert np.array_equal(maxs[:-1] + _U64_1, mins[1:]), f"gapless sigbits={sb}"
