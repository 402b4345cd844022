"""Temporal join operators: as-of join and bounded range join.

The reference (fanf2/hg64) is a histogram library with no notion of joins;
these operators extend the engine the same way SURVEY.md §2.6's relational
layer does — the time-series queries a transcript user runs around the
sketches ("what was the most recent signup before each purchase?", "how much
activity preceded each error?") need temporal joins Spark does not ship.

Both operators are pure Catalyst and scale-safe by construction:

* :func:`asof_join` uses the union-tag + window-carry technique (the classic
  stream-engine as-of): NO join at all — one Exchange on the key columns and
  one sort, the same cost as any per-key window.  A naive implementation
  (inequality join + row_number) is a BroadcastNestedLoopJoin that goes
  quadratic at scale.
* :func:`range_join_count` buckets event time into grains sized to the range
  width so every probe overlaps at most TWO grains: the inequality join
  becomes an equi-join on (key, grain) with the range predicate as a
  residual filter — SortMergeJoin at scale, never a nested loop (the plan is
  asserted cartesian-free in tests/test_temporal.py).

Skew note for 100 TB: both shuffle on the caller's key columns (user_id
here).  A single pathological key serializes one task in `asof_join` (window
semantics force it); `range_join_count` additionally fans keys out over
grains, so a hot key is split across time — prefer it when the key
distribution is heavy-tailed and the query is a windowed count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_us: str,
    right_us: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join: annotate every ``left`` row with the payload of
    the latest ``right`` row for the same key whose timestamp is ``<=`` the
    left row's (DuckDB ``ASOF LEFT JOIN`` / kdb ``aj`` semantics; ties at
    equal timestamps match, mirroring the ``>=`` inequality).

    ``right`` must be unique per ``(on..., right_us)`` — dedup with a
    deterministic tie-break first (the gate keeps ``max(event_id)``), or the
    carried payload would depend on sort stability.  Markers with a NULL
    timestamp are dropped (a marker at an undefined time precedes nothing;
    without the filter, NULLS-FIRST ordering would carry its payload to
    every probe before the first real marker).  A probe with a NULL
    timestamp gets a NULL match — same as ``NULL >= ts`` in the oracle.

    Returns all ``left`` columns plus one ``asof_<c>`` column per payload
    column (NULL when no right row precedes the left row).

    Plan shape: union of the two sides, ONE Exchange + sort on
    ``(on..., ts, side)``, a running ``last(payload, ignorenulls)`` window,
    then a filter back to the left rows.  Markers sort BEFORE probes at the
    same timestamp (side 0 < 1), which is exactly the ``>=`` tie rule; probe
    rows carry NULL payload, so `ignorenulls` makes intra-probe tie order
    irrelevant — the result is deterministic under any partitioning.
    """
    from pyspark.sql import Window

    on = list(on)
    payload_cols = list(payload_cols)
    pay = F.struct(*[F.col(c) for c in payload_cols])
    pay_type = right.select(pay.alias("p")).schema["p"].dataType
    carry_left = [c for c in left.columns if c not in on]

    lrows = left.select(
        *on,
        F.col(left_us).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_type).alias("__pay"),
        *[F.col(c) for c in carry_left],
    )
    rrows = right.filter(F.col(right_us).isNotNull()).select(
        *on,
        F.col(right_us).alias("__ts"),
        F.lit(0).alias("__side"),
        pay.alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry_left],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lrows.unionByName(rrows).withColumn(
        "__match", F.last("__pay", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *on,
        *[F.col(c) for c in carry_left],
        *[F.col("__match")[c].alias(f"asof_{c}") for c in payload_cols],
    )
    return out


def range_join_count(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    probe_us: str,
    build_us: str,
    lo_us: int,
    hi_us: int,
    count_col: str = "n_in_range",
) -> DataFrame:
    """For every ``probe`` row, count ``build`` rows with the same key whose
    timestamp satisfies ``probe_us - build_us BETWEEN lo_us AND hi_us``
    (``lo_us >= 1`` gives a strictly-preceding window that excludes the
    probe row itself).  Returns all probe columns plus ``count_col``;
    probes with no build rows in range get 0 (left join + count-non-null).

    Key matching is NULL-SAFE (``eqNullSafe``): a probe row with a NULL
    key matches build rows whose key is also NULL — SQL's ``IS NOT
    DISTINCT FROM``, not the plain equality of an ANSI inequality join
    (which would never match NULL to NULL).  Pre-filter NULL keys on both
    sides if standard join semantics are wanted; the shipped gate's oracle
    does exactly that.

    ``probe`` rows must be unique (same precondition style as
    :func:`asof_join`): the result groups by all probe columns, so two
    fully identical probe rows would merge into ONE output row with a
    doubled count — include a unique id column (the gate uses event_id).

    Scale path: grain ``G = hi_us`` buckets build time; a probe's window
    ``[p-hi, p-lo]`` spans at most two grains (its width ``hi-lo <= G``),
    so the probe side expands by at most 2x and the join is a pure
    equi-join on ``(on..., grain)`` with the BETWEEN as residual —
    SortMergeJoin, never BroadcastNestedLoop.  A build row's grain equals
    exactly one of the probe's two candidate grains, so no match is ever
    double-counted.
    """
    if not (1 <= lo_us <= hi_us):
        raise ValueError(f"need 1 <= lo_us <= hi_us, got [{lo_us}, {hi_us}]")
    on = list(on)
    g = hi_us
    # Spark DIV truncates toward zero, DuckDB // floors — identical on the
    # non-negative epoch-µs values used here (the oracle relies on this).
    b = build.select(
        *on,
        F.col(build_us).cast("long").alias("__bus"),
    ).withColumn("__g", F.expr(f"__bus DIV {g}"))
    p = probe.withColumn(
        "__g",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"({probe_us} - {hi_us}L) DIV {g}"),
                    F.expr(f"({probe_us} - {lo_us}L) DIV {g}"),
                )
            )
        ),
    )
    diff = F.col(probe_us).cast("long") - F.col("__bus")
    joined = p.join(
        b,
        [p[c].eqNullSafe(b[c]) for c in on]
        + [p["__g"] == b["__g"], diff >= lo_us, diff <= hi_us],
        "left",
    )
    return joined.groupBy(*[p[c] for c in probe.columns]).agg(
        F.count(F.col("__bus")).alias(count_col)
    )
