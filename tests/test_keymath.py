"""Exhaustive key-math validation — port of `hg64_validate`
(`/root/reference/hg64.c:446-469`) plus property tests for the numpy CLZ
replacement (`floor_log2_u64`)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hg64spark import keymath as km

U64 = np.uint64


def test_validate_exhaustive_sigbits_1_to_11():
    # the reference checks sigbits 1..11 (`hg64.c:448`)
    km.validate(max_sigbits=11)


def test_validate_covers_max_sigbits():
    km.validate(max_sigbits=15)


def test_sigbits_bounds():
    with pytest.raises(ValueError):
        km.check_sigbits(0)
    with pytest.raises(ValueError):
        km.check_sigbits(16)
    assert km.check_sigbits(5) == 5


def test_floor_log2_around_powers_of_two():
    # every power of two +-2, the exact region where float64 rounding could bite
    pts = []
    for k in range(64):
        p = 1 << k
        for d in (-2, -1, 0, 1, 2):
            v = p + d
            if 1 <= v < (1 << 64):
                pts.append(v)
    pts.append((1 << 64) - 1)
    arr = np.array(pts, dtype=U64)
    got = km.floor_log2_u64(arr)
    want = np.array([v.bit_length() - 1 for v in pts], dtype=U64)
    assert np.array_equal(got, want)


@given(st.integers(min_value=1, max_value=(1 << 64) - 1))
@settings(max_examples=500)
def test_floor_log2_matches_bit_length(v):
    assert int(km.floor_log2_u64(np.array([v], dtype=U64))[0]) == v.bit_length() - 1


@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.integers(min_value=1, max_value=15),
)
@settings(max_examples=300)
def test_value_in_its_bucket(v, sigbits):
    # min <= v <= max and key(min)==key(max)==key(v): `hg64.c:459-460`
    key = km.value_to_key(np.array([v], dtype=U64), sigbits)
    mn = km.key_to_minval(key, sigbits)
    mx = km.key_to_maxval(key, sigbits)
    assert int(mn[0]) <= v <= int(mx[0])
    assert np.array_equal(km.value_to_key(mn, sigbits), key)
    assert np.array_equal(km.value_to_key(mx, sigbits), key)


def test_relative_bucket_width_bound():
    # max relative width is 2**-sigbits for values past the denormal region
    for sb in (1, 2, 5, 9, 11):
        keys = np.arange(km.nkeys(sb), dtype=np.int64)
        mins = km.key_to_minval(keys, sb).astype(np.float64)
        maxs = km.key_to_maxval(keys, sb).astype(np.float64)
        mask = mins >= float(km.binsize(sb))  # normal region
        relw = (maxs[mask] - mins[mask]) / mins[mask]
        assert relw.max() <= 2.0 ** (-sb) + 1e-12


def test_denormals_are_exact_identity_keys():
    for sb in (1, 5, 15):
        bs = km.binsize(sb)
        vals = np.arange(bs, dtype=U64)
        assert np.array_equal(km.value_to_key(vals, sb), np.arange(bs, dtype=np.int64))


def test_interpolate_matches_c_semantics():
    # frac = mul/div (double), result = trunc(span*frac); div==0 -> frac=1
    span = np.array([100, 100, 7, 0], dtype=U64)
    mul = np.array([1, 3, 2, 5], dtype=U64)
    div = np.array([3, 0, 4, 9], dtype=U64)
    got = km.interpolate_u64(span, mul, div)
    assert got.tolist() == [33, 100, 3, 0]


def test_minval_unsigned_sql_matches_keymath_exhaustively():
    """sqloracle.minval_unsigned_expr (the HUGEINT oracle form that stays
    exact in the top decades where BIGINT << raises) must equal
    keymath.key_to_minval for EVERY key of the gated sigbits and for a
    high- and low-precision neighbor — including the >= 2^63 buckets the
    signed forms cannot represent."""
    import duckdb
    import numpy as np

    from hg64spark import keymath, sqloracle

    con = duckdb.connect()
    for sb in (1, 5, 11):
        n = keymath.nkeys(sb)
        expr = sqloracle.minval_unsigned_expr("k", sb)
        got = con.execute(
            f"SELECT CAST({expr} AS VARCHAR) FROM (SELECT unnest(range({n})) AS k) ORDER BY k"
        ).fetchall()
        want = keymath.key_to_minval(np.arange(n, dtype=np.int64), sb)
        assert [int(g[0]) for g in got] == [int(w) for w in want.tolist()], sb
        assert int(want[-1]) >= 1 << 63  # the top decade is really exercised
