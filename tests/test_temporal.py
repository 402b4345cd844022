"""Temporal joins: as-of and bounded range join vs naive references, plus
plan-shape assertions (the whole point of the operators is what they DON'T
do — no nested-loop join, no per-probe scan)."""

import random

import pytest
from pyspark.sql import functions as F

from hg64spark import temporal


def _synthetic(spark, seed=7, n_keys=6, n_left=120, n_right=40):
    rng = random.Random(seed)
    # deliberately includes: equal-timestamp ties (probe==marker ts), keys
    # with no markers at all, duplicate probe timestamps
    left = [
        (i, rng.randrange(n_keys), rng.randrange(0, 500) * 10)
        for i in range(n_left)
    ]
    right = [
        (1000 + j, rng.randrange(n_keys - 2), rng.randrange(0, 500) * 10)
        for j in range(n_right)
    ]
    ldf = spark.createDataFrame(left, "event_id long, k long, us long")
    rdf = (
        spark.createDataFrame(right, "event_id long, k long, us long")
        .groupBy("k", "us")
        .agg(F.max("event_id").alias("mid"))
    )
    return ldf, rdf, left, right


def _naive_asof(left, right):
    # right deduped per (k, us) keeping max id — mirror the gate's rule
    dedup = {}
    for j, k, us in right:
        key = (k, us)
        if key not in dedup or j > dedup[key]:
            dedup[key] = j
    out = {}
    for i, k, us in left:
        best = None
        for (rk, rus), rid in dedup.items():
            if rk == k and rus <= us:
                if best is None or rus > best[0] or (rus == best[0] and rid > best[1]):
                    best = (rus, rid)
        out[i] = best  # (marker_us, marker_id) or None
    return out


def test_asof_join_matches_naive(spark):
    ldf, rdf, left, right = _synthetic(spark)
    got = temporal.asof_join(ldf, rdf, ["k"], "us", "us", ["mid", "us"]).collect()
    want = _naive_asof(left, right)
    assert len(got) == len(left)
    for r in got:
        exp = want[r["event_id"]]
        if exp is None:
            assert r["asof_mid"] is None and r["asof_us"] is None, r
        else:
            assert (r["asof_us"], r["asof_mid"]) == exp, (r, exp)


def test_asof_join_tie_matches_equal_timestamp(spark):
    # a marker AT the probe's timestamp must match (>= semantics)
    ldf = spark.createDataFrame([(1, 0, 100)], "event_id long, k long, us long")
    rdf = spark.createDataFrame([(9, 0, 100)], "mid long, k long, us long")
    r = temporal.asof_join(ldf, rdf, ["k"], "us", "us", ["mid"]).first()
    assert r["asof_mid"] == 9


def test_asof_join_plan_has_no_join_operator(spark):
    """The union-carry as-of costs ONE Exchange and zero join operators —
    that absence IS the 100 TB story (vs the quadratic BNLJ of the naive
    inequality join)."""
    ldf, rdf, _, _ = _synthetic(spark)
    plan = temporal.asof_join(ldf, rdf, ["k"], "us", "us", ["mid"])._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan, plan


def _naive_range_count(left, build, lo, hi):
    out = {}
    for i, k, us in left:
        out[i] = sum(1 for bk, bus in build if bk == k and lo <= us - bus <= hi)
    return out


def test_range_join_count_matches_naive(spark):
    rng = random.Random(11)
    # timestamps dense around grain boundaries: hi=1000 makes the grain
    # G=1000, and values near multiples of 1000 exercise the 2-grain fanout
    probes = [(i, rng.randrange(3), rng.randrange(0, 5000)) for i in range(80)]
    build = [(rng.randrange(3), rng.randrange(0, 5000)) for _ in range(300)]
    # include exact boundary cases on an otherwise-unused key:
    # diff == lo and diff == hi match, diff == 0 and diff == hi+1 don't
    probes += [(900, 99, 2000)]
    build += [(99, 1999), (99, 1000), (99, 999), (99, 2000)]
    pdf = spark.createDataFrame(probes, "event_id long, k long, us long")
    bdf = spark.createDataFrame(build, "k long, us long")
    got = {
        r["event_id"]: r["n"]
        for r in temporal.range_join_count(pdf, bdf, ["k"], "us", "us", 1, 1000, "n").collect()
    }
    want = _naive_range_count(probes, build, 1, 1000)
    assert got == want
    # the hand-planted boundary probe: matches 1999 (diff 1) and 1000
    # (diff 1000), not 2000 (diff 0) nor 999 (diff 1001)
    assert got[900] == want[900] == 2


def test_range_join_rejects_bad_bounds(spark):
    pdf = spark.createDataFrame([(1, 0, 0)], "event_id long, k long, us long")
    with pytest.raises(ValueError):
        temporal.range_join_count(pdf, pdf, ["k"], "us", "us", 0, 10)
    with pytest.raises(ValueError):
        temporal.range_join_count(pdf, pdf, ["k"], "us", "us", 5, 4)


def test_range_join_plan_is_equi_join(spark):
    """Grain bucketing turns the inequality join into an equi-join — a
    CartesianProduct/BNLJ here means the operator regressed to the
    quadratic plan."""
    pdf = spark.createDataFrame([(1, 0, 0)], "event_id long, k long, us long")
    bdf = spark.createDataFrame([(0, 0)], "k long, us long")
    out = temporal.range_join_count(pdf, bdf, ["k"], "us", "us", 1, 1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_cms_join_size_never_undershoots():
    """Inner-product join-size estimate >= exact, on adversarially small
    widths where collisions are guaranteed."""
    import numpy as np

    from hg64spark.sketches import CMS

    rng = random.Random(3)
    for trial in range(5):
        a = [rng.randrange(40) for _ in range(300)]
        b = [rng.randrange(40) for _ in range(150)]
        exact = sum(1 for x in a for y in b if x == y)
        R = CMS(width=16, depth=3).add_values(np.array(a, dtype=str))
        S = CMS(width=16, depth=3).add_values(np.array(b, dtype=str))
        est = int((R.counts * S.counts).sum(axis=1).min())
        assert est >= exact


def test_mg_emergence_flag_is_sound_when_approximate():
    """The mg-minus-cms bracket stays sound even when MG genuinely
    approximates (k << distinct): every flagged item truly grew."""
    import numpy as np

    from hg64spark.sketches import CMS, MG

    rng = random.Random(5)
    items1 = [f"t{rng.randrange(50)}" for _ in range(2000)]
    # half 2: same base + a genuinely emerging item
    items2 = [f"t{rng.randrange(50)}" for _ in range(2000)] + ["hot"] * 700
    c1, c2 = {}, {}
    for it in items1:
        c1[it] = c1.get(it, 0) + 1
    for it in items2:
        c2[it] = c2.get(it, 0) + 1
    mg = MG(k=5).add_values(np.array(items2, dtype=object))
    cms = CMS(width=64, depth=4).add_values(np.array(items1, dtype=str))
    flagged = [
        it for it in mg.counters
        if int(mg.estimate(it)[0]) - int(cms.estimate(np.array([it], dtype=str))[0]) > 0
    ]
    assert "hot" in flagged or flagged == []  # hot should dominate; but soundness is the law:
    for it in flagged:
        assert c2.get(it, 0) - c1.get(it, 0) > 0, it
    assert flagged, "adversarial setup should flag the planted emerging item"


def test_funnel_single_exchange_plan(spark):
    """The funnel's two running-min windows and the final per-user aggregate
    all share ONE hash partitioning on user_id — a second Exchange means the
    chain regressed to the join-cascade shape."""
    from hg64spark import queries as hq

    plan = (
        hq.q_funnel_events(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2, plan  # 1 data Exchange + possible AQE read
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_funnel_same_microsecond_tie_is_inclusive(spark):
    """A click at the SAME microsecond as the signup qualifies (>= semantics
    via the RANGE window frame), regardless of event_id order — exercised
    through the PRODUCTION helper the gate uses."""
    from hg64spark.queries import funnel_stage_times

    rows = [
        # click (lower event_id) and signup share us=100; purchase later
        (1, 7, "click", 100),
        (2, 7, "signup", 100),
        (3, 7, "purchase", 200),
        # control user: click BEFORE signup never qualifies
        (4, 8, "click", 50),
        (5, 8, "signup", 60),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, us long")
    got = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_stage_times(df, ["signup", "click", "purchase"]).collect()
    }
    assert got[7] == (100, 100, 200)  # tie click counts
    assert got[8] == (60, None, None)  # pre-signup click does not


def test_asof_join_null_marker_timestamp_is_dropped(spark):
    """A marker with NULL timestamp must not be carried to early probes
    (NULLS-FIRST ordering would otherwise 'match' it before the first real
    marker)."""
    ldf = spark.createDataFrame([(1, 0, 50), (2, 0, 300)], "event_id long, k long, us long")
    rdf = spark.createDataFrame(
        [(8, 0, None), (9, 0, 200)], "mid long, k long, us long"
    )
    got = {
        r["event_id"]: r["asof_mid"]
        for r in temporal.asof_join(ldf, rdf, ["k"], "us", "us", ["mid"]).collect()
    }
    assert got == {1: None, 2: 9}


def test_retention_offset0_covers_every_user(spark):
    """Every user is active in their own cohort week, so the offset-0 cells
    partition the user population exactly."""
    from hg64spark import queries as hq

    rows = hq.q_retention_cohorts(spark, "/root/testdata/sf0.001").collect()
    total_users = sum(r["exact_users"] for r in rows if r["offset_wk"] == 0)
    from hg64spark import io as hio

    expect = (
        hio.read_table(spark, "/root/testdata/sf0.001", "events")
        .filter("user_id IS NOT NULL AND ts IS NOT NULL")
        .select("user_id")
        .distinct()
        .count()
    )
    assert total_users == expect
    assert all(r["hll_ok"] for r in rows)
