"""Companion sketch tests: merge laws, serde round-trips, published error
bounds vs exact oracles (FIXTURES.md F3)."""

import numpy as np
import pytest

from hg64spark.sketches import HLL, CMS, Bloom, KLL

SEED = 42


def rng():
    return np.random.default_rng(SEED)


# ------------------------------------------------------------------- HLL


def test_hll_error_within_published_bound():
    for true_n in (100, 10_000, 200_000):
        vals = np.arange(true_n, dtype=np.int64) * 7919 + 13
        est = HLL(14).add_values(vals).estimate()
        bound = 3 * HLL.error_bound(14)
        assert abs(est - true_n) / true_n <= bound, (true_n, est)


def test_hll_merge_exact_and_commutative():
    a_vals = rng().integers(0, 50_000, 80_000)
    b_vals = rng().integers(25_000, 75_000, 80_000)
    direct = HLL(12).add_values(np.concatenate([a_vals, b_vals]))
    a, b = HLL(12).add_values(a_vals), HLL(12).add_values(b_vals)
    ab = HLL(12).merge(a).merge(b)
    ba = HLL(12).merge(b).merge(a)
    assert ab == ba == direct  # register max is exactly order-independent


def test_hll_strings_and_serde():
    vals = np.array([f"conv_{i:08d}" for i in range(5000)], dtype=object)
    h = HLL(12).add_values(vals)
    back = HLL.deserialize(h.serialize())
    assert back == h
    assert abs(back.estimate() - 5000) / 5000 <= 3 * HLL.error_bound(12)


def test_hll_merge_p_mismatch():
    with pytest.raises(ValueError):
        HLL(12).merge(HLL(14))


def test_hll_set_algebra():
    """union is EXACT HLL algebra (identical to a concatenated-stream
    build, inputs untouched); intersection_estimate tracks the true
    overlap within the compounded 3-sigma(|A|+|B|+|A∪B|) bound across
    overlap fractions, and clamps to >= 0 on disjoint sets."""
    for frac in (0.0, 0.2, 0.8):
        n = 60_000
        shift = int(n * (1.0 - frac))
        a_vals = np.arange(n, dtype=np.int64) * 7919 + 13
        b_vals = (np.arange(n, dtype=np.int64) + shift) * 7919 + 13
        true_common = n - shift
        a, b = HLL(14).add_values(a_vals), HLL(14).add_values(b_vals)
        a_regs = a.registers.copy()
        u = a.union(b)
        assert np.array_equal(a.registers, a_regs), "union must not mutate"
        direct = HLL(14).add_values(np.concatenate([a_vals, b_vals]))
        assert u == direct
        est = HLL.intersection_estimate(a, b)
        assert est >= 0.0
        bound = 3 * HLL.error_bound(14) * (a.estimate() + b.estimate() + u.estimate())
        assert abs(est - true_common) <= bound, (frac, est, true_common, bound)
    with pytest.raises(ValueError):
        HLL(12).union(HLL(14))


# ------------------------------------------------------------------- CMS


def test_cms_never_underestimates_and_bound():
    # zipf-ish stream
    r = rng()
    vals = (r.zipf(1.3, 200_000) % 10_000).astype(np.int64)
    cms = CMS(width=2048, depth=5).add_values(vals)
    uniq, true_counts = np.unique(vals, return_counts=True)
    est = cms.estimate(uniq)
    assert np.all(est >= true_counts)  # hard guarantee
    overshoot = est - true_counts
    n = vals.size
    # eps*N bound holds with prob 1-e^-5 per item; assert on the 99.9th pct
    assert np.quantile(overshoot, 0.999) <= cms.epsilon() * n


def test_cms_merge_is_addition():
    a_vals = rng().integers(0, 1000, 50_000)
    b_vals = rng().integers(0, 1000, 50_000)
    direct = CMS(1024, 4).add_values(np.concatenate([a_vals, b_vals]))
    merged = CMS(1024, 4).add_values(a_vals).merge(CMS(1024, 4).add_values(b_vals))
    assert merged == direct
    assert merged.total == 100_000


def test_cms_weighted_and_serde():
    cms = CMS(512, 4).add_values(np.array([1, 2, 3]), weights=np.array([10, 20, 30]))
    back = CMS.deserialize(cms.serialize())
    assert back == cms
    assert back.estimate(np.array([2]))[0] >= 20
    assert back.total == 60


# ------------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives():
    members = np.array([f"conv_{i}" for i in range(20_000)], dtype=object)
    bf = Bloom.for_capacity(20_000, fpp=0.01).add_values(members)
    assert bool(bf.contains(members).all())


def test_bloom_fpp_within_bound():
    n = 20_000
    members = np.arange(n, dtype=np.int64)
    bf = Bloom.for_capacity(n, fpp=0.01).add_values(members)
    probes = np.arange(10**7, 10**7 + 50_000, dtype=np.int64)  # disjoint
    fp = float(bf.contains(probes).mean())
    assert fp <= 3 * max(bf.fpp_bound(n), 0.001), fp


def test_bloom_merge_is_or():
    a = Bloom(1 << 14, 5).add_values(np.arange(1000))
    b = Bloom(1 << 14, 5).add_values(np.arange(1000, 2000))
    direct = Bloom(1 << 14, 5).add_values(np.arange(2000))
    assert a.merge(b) == direct


def test_bloom_intersect_is_conservative_filter():
    """Bitwise-AND intersect: no false negatives for true A∩B members,
    never admits anything BOTH sides' filters would reject, and rejects
    config mismatches like merge."""
    common = np.arange(5000, dtype=np.int64)
    a = Bloom(1 << 15, 5).add_values(np.concatenate([common, np.arange(10_000, 14_000)]))
    b = Bloom(1 << 15, 5).add_values(np.concatenate([common, np.arange(20_000, 24_000)]))
    both = Bloom.deserialize(a.serialize()).intersect(b)  # keep a intact
    assert bool(both.contains(common).all()), "intersection member rejected"
    # conservative: (A AND B) bits are a subset of each side's bits, so
    # anything the intersect admits, both sides admit
    probes = np.arange(50_000, 120_000, dtype=np.int64)
    hits = both.contains(probes)
    assert bool((~hits | a.contains(probes)).all())
    assert bool((~hits | b.contains(probes)).all())
    with pytest.raises(ValueError):
        Bloom(1 << 15, 5).intersect(Bloom(1 << 14, 5))


def test_bloom_serde_roundtrip():
    bf = Bloom(1 << 10, 3).add_values(np.array(["x", "y"], dtype=object))
    back = Bloom.deserialize(bf.serialize())
    assert back == bf
    assert bool(back.contains(np.array(["x"], dtype=object))[0])


# ------------------------------------------------------------------- KLL


def test_kll_rank_error_within_bound():
    data = rng().uniform(0, 1e9, 500_000)
    kll = KLL(200)
    for chunk in np.array_split(data, 20):
        kll.add_values(chunk)
    assert kll.n == data.size
    data_sorted = np.sort(data)
    eps = KLL.rank_error_bound(200) + 0.01  # slack for finite confidence
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = float(kll.value_at_quantile(np.array([q]))[0])
        true_rank = np.searchsorted(data_sorted, est, side="right") / data.size
        assert abs(true_rank - q) <= eps, (q, true_rank)


def test_kll_merge_within_bound():
    data = rng().uniform(0, 1e6, 300_000)
    parts = np.array_split(data, 16)
    merged = KLL(200)
    for p in parts:
        merged.merge(KLL(200).add_values(p))
    assert merged.n == data.size
    data_sorted = np.sort(data)
    eps = KLL.rank_error_bound(200) + 0.015
    for q in (0.1, 0.5, 0.9, 0.99):
        est = float(merged.value_at_quantile(np.array([q]))[0])
        true_rank = np.searchsorted(data_sorted, est, side="right") / data.size
        assert abs(true_rank - q) <= eps, (q, true_rank)


def test_kll_memory_sublinear():
    kll = KLL(200)
    for chunk in np.array_split(rng().uniform(0, 1, 1_000_000), 50):
        kll.add_values(chunk)
    assert kll._size() < 3000  # vs 1M items ingested


def test_kll_serde_roundtrip():
    kll = KLL(128).add_values(rng().uniform(0, 100, 10_000))
    back = KLL.deserialize(kll.serialize())
    assert back.k == kll.k and back.n == kll.n
    assert all(np.array_equal(a, b) for a, b in zip(back.levels, kll.levels))
    qs = np.array([0.25, 0.5, 0.75])
    assert np.array_equal(back.value_at_quantile(qs), kll.value_at_quantile(qs))


def test_kll_rank_of_value_consistency():
    data = rng().uniform(0, 1000, 100_000)
    kll = KLL(200).add_values(data)
    for q in (0.2, 0.5, 0.8):
        v = float(kll.value_at_quantile(np.array([q]))[0])
        r = float(kll.rank_of_value(np.array([v]))[0]) / kll.n
        assert abs(r - q) <= 2 * KLL.rank_error_bound(200) + 0.01


# ----------------------------------------------------------------- t-digest


def test_tdigest_rank_error_and_tail_accuracy():
    from hg64spark.sketches.tdigest import TDigest

    data = rng().uniform(0, 1e9, 400_000)
    td = TDigest(100)
    for chunk in np.array_split(data, 16):
        td.add_values(chunk)
    assert td.n == data.size
    data_sorted = np.sort(data)
    for q, tol in [(0.01, 0.005), (0.1, 0.02), (0.5, 0.03), (0.9, 0.02), (0.99, 0.005), (0.999, 0.002)]:
        est = float(td.value_at_quantile(np.array([q]))[0])
        true_rank = np.searchsorted(data_sorted, est) / data.size
        assert abs(true_rank - q) <= tol, (q, true_rank)


def test_tdigest_merge_within_bound():
    from hg64spark.sketches.tdigest import TDigest

    data = rng().lognormal(0, 2, 300_000) * 1e3
    parts = np.array_split(data, 8)
    merged = TDigest(100)
    for p in parts:
        merged.merge(TDigest(100).add_values(p))
    assert merged.n == data.size
    data_sorted = np.sort(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = float(merged.value_at_quantile(np.array([q]))[0])
        true_rank = np.searchsorted(data_sorted, est) / data.size
        assert abs(true_rank - q) <= 0.03, (q, true_rank)


def test_tdigest_bounded_size_and_serde():
    from hg64spark.sketches.tdigest import TDigest

    td = TDigest(100)
    for chunk in np.array_split(rng().normal(0, 1, 500_000), 25):
        td.add_values(chunk)
    td._compress()
    assert td.means.size < 2 * 100  # centroids bounded by ~delta
    back = TDigest.deserialize(td.serialize())
    assert back.n == td.n and np.array_equal(back.means, td.means)
    qs = np.array([0.05, 0.5, 0.95])
    assert np.array_equal(back.value_at_quantile(qs), td.value_at_quantile(qs))


def test_tdigest_min_max_exact():
    from hg64spark.sketches.tdigest import TDigest

    data = rng().uniform(10, 20, 50_000)
    td = TDigest(50).add_values(data)
    assert float(td.value_at_quantile(np.array([0.0]))[0]) == data.min()
    assert float(td.value_at_quantile(np.array([1.0]))[0]) == data.max()


def test_cross_family_probing_refused():
    """Regression: probing an xxhash64-built sketch through the Python
    siphash path would return garbage (incl. Bloom false negatives) — it must
    raise instead."""
    from hg64spark.sketches.bloom import HASH_XXHASH64

    bf = Bloom(1 << 10, 3, hash_family=HASH_XXHASH64)
    with pytest.raises(ValueError, match="relational"):
        bf.contains(np.array([1, 2]))
    with pytest.raises(ValueError):
        bf.add_values(np.array([1]))
    cms = CMS(64, 3, hash_family=1)
    with pytest.raises(ValueError, match="relational"):
        cms.estimate(np.array([1]))
    with pytest.raises(ValueError):
        cms.add_values(np.array([1]))


def test_kll_weighted_matches_repeat_semantics():
    """Weighted ingest == repeat inserts, checked against exact weighted
    quantiles within the published rank bound (both paths are randomized, so
    the check is bound-based, not bitwise)."""
    rng_ = np.random.default_rng(7)
    vals = rng_.uniform(0, 1000, 5_000)
    w = rng_.integers(1, 20, 5_000)
    sk = KLL(200, seed=3).add_values(vals, weights=w)
    assert sk.n == int(w.sum())
    expanded = np.repeat(vals, w)
    eps = KLL.rank_error_bound(200) + 0.01
    for q in (0.1, 0.5, 0.9, 0.99):
        est = float(sk.value_at_quantile(q)[0])
        true_rank = float((expanded <= est).mean())
        assert abs(true_rank - q) <= eps, (q, est, true_rank)


def test_kll_weighted_merge_invariance():
    """Partitioned weighted ingest + merge answers like one weighted ingest
    (in bound, and with exactly the same total weight n)."""
    rng_ = np.random.default_rng(11)
    vals = rng_.uniform(0, 100, 3_000)
    w = rng_.integers(0, 9, 3_000)  # include zero weights (no-ops)
    whole = KLL(128, seed=5).add_values(vals, weights=w)
    merged = KLL(128, seed=6)
    for part in np.array_split(np.arange(3_000), 7):
        merged.merge(KLL(128, seed=int(part[0])).add_values(vals[part], weights=w[part]))
    assert merged.n == whole.n == int(w.sum())
    expanded = np.repeat(vals, w)
    eps = KLL.rank_error_bound(128) + 0.02
    for q in (0.25, 0.5, 0.75, 0.95):
        for sk in (whole, merged):
            est = float(sk.value_at_quantile(q)[0])
            assert abs(float((expanded <= est).mean()) - q) <= eps


def test_tdigest_weighted_matches_repeat_semantics():
    from hg64spark.sketches.tdigest import TDigest

    rng_ = np.random.default_rng(13)
    vals = rng_.uniform(0, 1000, 4_000)
    w = rng_.integers(1, 16, 4_000)
    td = TDigest(100).add_values(vals, weights=w)
    assert td.n == int(w.sum())
    expanded = np.sort(np.repeat(vals, w))
    for q in (0.01, 0.5, 0.99):
        est = float(td.value_at_quantile(q)[0])
        true_rank = float((expanded <= est).mean())
        assert abs(true_rank - q) <= 0.03, (q, est, true_rank)


def test_weighted_ingest_rejects_bad_weights():
    from hg64spark.sketches.tdigest import TDigest

    for sk in (KLL(64), TDigest(100)):
        with pytest.raises(ValueError):
            sk.add_values(np.array([1.0]), weights=np.array([-1]))
        with pytest.raises(ValueError):
            sk.add_values(np.array([1.0]), weights=np.array([0.5]))
        with pytest.raises(ValueError):
            sk.add_values(np.array([1.0, 2.0]), weights=np.array([1]))


def test_kll_partition_seed_decorrelates_equal_content(monkeypatch):
    """Equal-content partials on DIFFERENT Spark partitions must draw
    independent compaction coins (the KLL error proof assumes independence);
    the lazy seed mixes TaskContext.partitionId() to guarantee it.  Same
    partition id + same content stays deterministic (reproducibility)."""
    from hg64spark.sketches import kll as kll_mod

    vals = np.arange(5000, dtype=np.float64)

    def build(pid: int) -> KLL:
        monkeypatch.setattr(kll_mod, "_partition_component", lambda: pid)
        return KLL(16).add_values(vals)

    a0, b0, a1 = build(0), build(0), build(1)
    assert a0.serialize() == b0.serialize()  # deterministic within a partition
    # decorrelated across partitions: the coin streams (and hence retained
    # items) differ even though the ingested content is identical
    assert a0.serialize() != a1.serialize()


# --------------------------------------------- property tests (merge laws)

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=0, max_size=300), st.integers(0, 1000))
@settings(max_examples=30, deadline=None)
def test_property_hll_split_invariance(values, seed):
    arr = np.array(values, dtype=np.int64)
    rng_ = np.random.default_rng(seed)
    assign = rng_.integers(0, 3, arr.size) if arr.size else np.empty(0, dtype=int)
    merged = HLL(10)
    for i in rng_.permutation(3):
        merged.merge(HLL(10).add_values(arr[assign == i]))
    assert merged == HLL(10).add_values(arr)


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=300), st.integers(0, 1000))
@settings(max_examples=30, deadline=None)
def test_property_cms_bloom_split_invariance(values, seed):
    arr = np.array(values, dtype=np.int64)
    rng_ = np.random.default_rng(seed)
    assign = rng_.integers(0, 3, arr.size) if arr.size else np.empty(0, dtype=int)
    mc = CMS(256, 3)
    mb = Bloom(1 << 10, 3)
    for i in rng_.permutation(3):
        part = arr[assign == i]
        mc.merge(CMS(256, 3).add_values(part))
        mb.merge(Bloom(1 << 10, 3).add_values(part))
    assert mc == CMS(256, 3).add_values(arr)
    assert mb == Bloom(1 << 10, 3).add_values(arr)


def test_kll_explicit_seed_survives_serde():
    """An explicit compaction seed must keep its coin stream through the
    serialize->merge path (every Spark partial round-trips through bytes)."""
    import numpy as np

    from hg64spark.sketches import KLL

    a = KLL(64, seed=7)
    a.add_values(np.arange(10_000, dtype=np.float64))
    blob = a.serialize()
    b, c = KLL.deserialize(blob), KLL.deserialize(blob)
    assert b._seed == 7 and c._seed == 7
    # two resumed copies replay the identical coin stream (the RNG *position*
    # is not persisted — only the seed — so a resumed copy restarts the
    # stream; what matters is that resumption is reproducible)
    b.add_values(np.arange(10_000, 20_000, dtype=np.float64))
    c.add_values(np.arange(10_000, 20_000, dtype=np.float64))
    assert b.serialize() == c.serialize()


def test_kll_data_derived_seeds_decorrelate_partials():
    """Two partials over different data must not share a coin stream, and an
    empty level 0 (the state right after a merge of already-compacted
    partials) with EQUAL n must not degenerate the seed to f(n)."""
    import numpy as np

    from hg64spark.sketches import KLL

    a = KLL(64).add_values(np.arange(5_000, dtype=np.float64))
    b = KLL(64).add_values(np.arange(5_000, 10_000, dtype=np.float64))
    a._coin(), b._coin()
    assert a._rng.bit_generator.state != b._rng.bit_generator.state

    # the degenerate path the fix targets: empty level 0, same n, different
    # upper-level data -> seeds must still differ
    e = np.empty(0, dtype=np.float64)
    c = KLL(64, levels=[e.copy(), np.arange(100, dtype=np.float64)], n=200)
    d = KLL(64, levels=[e.copy(), np.arange(100, 200, dtype=np.float64)], n=200)
    c._coin(), d._coin()
    assert c._rng.bit_generator.state != d._rng.bit_generator.state


def test_kll_seed_validation_and_legacy_header():
    """Seeds aliasing the wire sentinel are rejected up front; legacy
    14-byte (pre-seed) headers still load instead of reading as corrupt."""
    import struct

    import numpy as np
    import pytest

    from hg64spark import serde
    from hg64spark.sketches import KLL

    with pytest.raises(ValueError):
        KLL(64, seed=-1)
    with pytest.raises(ValueError):
        KLL(64, seed=(1 << 64) - 1)

    sk = KLL(64).add_values(np.arange(1_000, dtype=np.float64))
    header = struct.pack("<HIQ", sk.k, len(sk.levels), sk.n)
    parts = []
    for lv in sk.levels:
        parts.append(struct.pack("<I", lv.size))
        parts.append(lv.astype("<f8").tobytes())
    legacy = serde.pack(serde.TYPE_KLL, header, b"".join(parts))
    back = KLL.deserialize(legacy)
    assert back.n == sk.n and back._seed is None
    assert [l.tolist() for l in back.levels] == [l.tolist() for l in sk.levels]


def test_bloom_contains_keeps_null_probe_rows(spark):
    """A NULL probe value yields bloom_contains=false, not a dropped row."""
    from hg64spark import relational
    from hg64spark.sketches import Bloom

    n_bits, k = 1 << 10, 3
    vals = spark.createDataFrame([("x",), ("y",)], "v string")
    blob = relational.bloom_agg_relational(vals, "v", n_bits, k).collect()[0]["sketch"]
    words = relational.bloom_words_df(spark, Bloom.deserialize(bytes(blob)))
    probes = spark.createDataFrame([("x",), (None,), ("zzz",)], "v string")
    out = relational.bloom_contains_relational(probes, "v", words, n_bits, k).collect()
    got = {r["v"]: r["bloom_contains"] for r in out}
    assert len(out) == 3 and got["x"] is True and got[None] is False


# ----------------------------------------------------------------- MG


def test_mg_bounds_and_no_missed_heavy_hitter():
    """Published guarantees under real decrements: estimates never exceed the
    true count, undercount by at most n/(k+1), and every item above the
    threshold is tracked."""
    from hg64spark.sketches import MG

    r = rng()
    vals = (r.zipf(1.5, 100_000) % 5_000).astype(np.int64)
    k = 32
    mg = MG(k)
    for chunk in np.array_split(vals, 10):
        mg.add_values(chunk)
    assert mg.n == vals.size
    assert len(mg.counters) <= k
    uniq, true_counts = np.unique(vals, return_counts=True)
    est = mg.estimate(uniq)
    bound = mg.error_bound()
    assert np.all(est <= true_counts)
    assert np.all(est >= true_counts - bound)
    heavy = uniq[true_counts > bound]
    assert all(str(h) in mg.counters for h in heavy), "heavy hitter missed"


def test_mg_merge_bound_holds_across_splits():
    from hg64spark.sketches import MG

    r = rng()
    vals = (r.zipf(1.3, 200_000) % 2_000).astype(np.int64)
    k = 64
    merged = MG(k)
    for part in np.array_split(vals, 16):
        merged.merge(MG(k).add_values(part))
    assert merged.n == vals.size
    uniq, true_counts = np.unique(vals, return_counts=True)
    est = merged.estimate(uniq)
    assert np.all(est <= true_counts)
    assert np.all(est >= true_counts - merged.error_bound())


def test_mg_exact_when_distinct_fits_and_serde():
    from hg64spark.sketches import MG

    vals = np.array(["a"] * 5 + ["b"] * 3 + ["c"] * 2, dtype=object)
    mg = MG(16).add_values(vals)
    assert mg.top() == [("a", 5), ("b", 3), ("c", 2)]
    assert mg.error_bound() == 0
    back = MG.deserialize(mg.serialize())
    assert back == mg
    # weighted, merge k-mismatch, corrupt input
    w = MG(8).add_values(np.array(["x", "y"]), weights=np.array([7, 2]))
    assert w.estimate(["x"])[0] == 7 and w.n == 9
    import pytest as _pytest

    with _pytest.raises(ValueError):
        MG(8).merge(MG(16))
    with _pytest.raises(ValueError):
        MG.deserialize(mg.serialize()[:12])


def test_mg_deserialize_rejects_invariant_violations():
    """A well-framed blob whose content breaks the MG invariants (more than k
    counters / non-positive counts / counters exceeding n) must not load into
    a sketch with silently-wrong bounds."""
    import pytest as _pytest

    from hg64spark.sketches import MG

    def blob(k, n, counters):
        fake = MG(1_000_000)  # big k so serialize() doesn't shrink
        fake.counters = dict(counters)
        fake.n = n
        fake.k = k  # forged header k
        return fake.serialize()

    with _pytest.raises(ValueError, match="counters > k"):
        MG.deserialize(blob(2, 10, {"a": 1, "b": 1, "c": 1}))
    with _pytest.raises(ValueError, match="non-positive"):
        MG.deserialize(blob(8, 10, {"a": 0}))
    with _pytest.raises(ValueError, match="exceed stream length"):
        MG.deserialize(blob(8, 3, {"a": 5}))
    # exact integer accumulation near 2^53: float64 bincount would round
    big = 1 << 53
    w = MG(8).add_values(np.array(["x", "x"]), weights=np.array([big + 1, big + 3], dtype=np.uint64))
    assert int(w.estimate(["x"])[0]) == 2 * big + 4


def test_kll_tdigest_deserialize_reject_invariant_violations():
    """Well-framed blobs with invariant-violating content (weights not
    summing to n, unsorted/non-positive centroids, non-finite items) must
    raise, mirroring the MG/hg64 corruption handling."""
    import struct as _struct

    from hg64spark import serde
    from hg64spark.sketches.tdigest import TDigest

    # KLL: forge n that disagrees with the level weights
    good = KLL(64, seed=1).add_values(np.arange(1_000, dtype=np.float64))
    blob = good.serialize()
    _, header, payload = serde.expect(blob, serde.TYPE_KLL)
    k, n_levels, n, seed = _struct.unpack("<HIQQ", header)
    bad = serde.pack(serde.TYPE_KLL, _struct.pack("<HIQQ", k, n_levels, n + 7, seed), payload)
    with pytest.raises(ValueError, match="do not sum to n"):
        KLL.deserialize(bad)
    assert KLL.deserialize(blob).n == 1_000  # the genuine blob still loads

    # t-digest: forge a negative weight / unsorted means / bad n
    td = TDigest(100).add_values(np.arange(500, dtype=np.float64))
    tblob = td.serialize()
    _, theader, tpayload = serde.expect(tblob, serde.TYPE_TDIGEST)
    delta, n, vmin, vmax = _struct.unpack("<IQdd", theader)
    (kc,) = _struct.unpack_from("<I", tpayload, 0)
    means = np.frombuffer(tpayload, dtype="<f8", count=kc, offset=4).copy()
    weights = np.frombuffer(tpayload, dtype="<i8", count=kc, offset=4 + 8 * kc).copy()

    def remake(m, w, nn):
        pl = _struct.pack("<I", m.size) + m.astype("<f8").tobytes() + w.astype("<i8").tobytes()
        return serde.pack(serde.TYPE_TDIGEST, _struct.pack("<IQdd", delta, nn, vmin, vmax), pl)

    w_bad = weights.copy(); w_bad[0] = -1
    with pytest.raises(ValueError, match="non-positive"):
        TDigest.deserialize(remake(means, w_bad, n))
    m_bad = means.copy(); m_bad[0], m_bad[-1] = m_bad[-1], m_bad[0]
    with pytest.raises(ValueError, match="not sorted"):
        TDigest.deserialize(remake(m_bad, weights, n))
    with pytest.raises(ValueError, match="sum to n"):
        TDigest.deserialize(remake(means, weights, n + 3))
    assert TDigest.deserialize(tblob).n == 500


def test_hg64_qov_empty_sketch_is_nan():
    from hg64spark.hg64 import HG64

    q = HG64(5).snapshot().quantile_of_value([0, 5, 100])
    assert np.isnan(q).all()


def test_cms_subtract_is_exact_inverse_and_guards():
    """CMS is linear, so retracting a genuine sub-stream's sketch is the
    exact inverse of merge (cells AND estimates); dimension/hash-family
    mismatch and cell underflow raise."""
    import numpy as np

    from hg64spark.sketches import CMS

    rng = np.random.default_rng(9)
    a_items = rng.integers(0, 500, 4000).astype(str)
    b_items = rng.integers(0, 500, 1500).astype(str)
    a = CMS(256, 4).add_values(a_items)
    ab = CMS(256, 4).add_values(a_items).add_values(b_items)
    b = CMS(256, 4).add_values(b_items)
    assert ab.subtract(b) == a and ab.total == a.total
    with pytest.raises(ValueError, match="underflow|sub-sketch"):
        CMS(256, 4).add_values(a_items[:5]).subtract(CMS(256, 4).add_values(a_items))
    with pytest.raises(ValueError, match="dimensions|hash family"):
        CMS(256, 4).subtract(CMS(128, 4))
