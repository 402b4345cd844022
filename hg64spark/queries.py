"""The driver-facing query registry: Spark query + matching DuckDB oracle SQL.

Every hg64 operator from SURVEY.md §2 is exposed here as a pair
(queries()[name], oracle_sql()[name]).  The hg64 oracles are *exact*: the SQL
re-implements the bucket/rank/interpolation math (see ``sqloracle.py``), so
the driver's value-hash compare is a hard bit-for-bit gate on the whole Spark
pipeline (partial sketches -> shuffle -> merge -> finalize).

Column names are aliased identically on both sides (driver compares sorted
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hg64spark import agg, sqloracle, transcripts
from hg64spark.hg64 import HG64

# the reference harness's quantile sweep shape (`/root/reference/test.c:245-256`),
# clipped of q=0/1 (q=0 is the documented low-rank interpolation artifact,
# SURVEY.md §7; q=1 returns UINT64_MAX which has no int64 SQL representation)
QSWEEP = [0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999, 0.9999]

SIGBITS = 5

_EVENTS_VALUE_SQL = "SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS v FROM events"

_LATENCY_BASE_SQL = transcripts.LATENCY_SQL.format(base=transcripts.TRANSCRIPTS_SQL)
_TEXTLEN_BASE_SQL = f"SELECT role, length(text) AS v FROM ({transcripts.TRANSCRIPTS_SQL})"
_TURNS_BASE_SQL = f"SELECT CAST(count(*) AS BIGINT) AS v FROM ({transcripts.TRANSCRIPTS_SQL}) GROUP BY conv_id"

_RANK_PROBES = [100, 5_000, 40_000, 123_456, 300_000, 480_000]


def _events_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select("event_type", F.floor(F.col("value") * 1000).cast("long").alias("v"))


def _latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts.transcripts_from_events(spark, sf_dir)
    return transcripts.with_latency(t)


# ----------------------------------------------------------------- queries


def q_hg64_buckets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = agg.hg64_agg(_events_values(spark, sf_dir), "v", [], SIGBITS)
    return agg.hg64_buckets(sk, [])


def q_hg64_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = agg.hg64_agg(_events_values(spark, sf_dir), "v", ["event_type"], SIGBITS)
    return agg.hg64_quantiles(sk, ["event_type"], QSWEEP)


def q_hg64_ranks_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = agg.hg64_agg(_events_values(spark, sf_dir), "v", [], SIGBITS)
    return agg.hg64_ranks(sk, [], _RANK_PROBES)


def q_hg64_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = agg.hg64_agg(_events_values(spark, sf_dir), "v", ["event_type"], SIGBITS)
    return agg.hg64_stats(sk, ["event_type"])


def q_latency_quantiles_by_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (north_star): per-tool inter-turn latency quantiles over the
    transcript table, end to end through the distributed sketch pipeline."""
    lat = _latency(spark, sf_dir)
    sk = agg.hg64_agg(lat, "latency_us", ["tool"], SIGBITS)
    return agg.hg64_quantiles(sk, ["tool"], QSWEEP)


def q_textlen_buckets_by_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts.transcripts_from_events(spark, sf_dir)
    t = t.select("role", F.length("text").alias("v"))
    sk = agg.hg64_agg(t, "v", ["role"], SIGBITS)
    return agg.hg64_buckets(sk, ["role"])


def q_turncount_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregate: exact count(*) per conversation (built-in Spark,
    shuffles longs), then an hg64 sketch over the per-conv turn counts."""
    t = transcripts.transcripts_from_events(spark, sf_dir)
    counts = t.groupBy("conv_id").agg(F.count("*").alias("v"))
    sk = agg.hg64_agg(counts, "v", [], SIGBITS)
    return agg.hg64_quantiles(sk, [], [0.1, 0.5, 0.9, 0.99])


def q_hg64_downsample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-precision merge (`/root/reference/test.c:159-168`): sketch at
    sigbits=8, downsample to 4 (pure re-keying — exact), explode buckets.
    Oracle: direct sigbits=4 bucketing of the same values."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    vals = li.select((F.floor(F.col("l_extendedprice") * 100)).cast("long").alias("v"))
    fine = agg.sketch_agg(vals, "v", [], lambda: HG64(8), HG64.deserialize)

    def downsample_blob(blob: bytes) -> bytes:
        return HG64.deserialize(blob).downsample(4).serialize()

    from pyspark.sql.types import BinaryType
    ds_udf = F.udf(downsample_blob, BinaryType())
    coarse = fine.select(ds_udf(F.col("sketch")).alias("sketch"))
    return agg.hg64_buckets(coarse, [])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "hg64_buckets_events": q_hg64_buckets_events,
        "hg64_quantiles_events": q_hg64_quantiles_events,
        "hg64_ranks_events": q_hg64_ranks_events,
        "hg64_stats_events": q_hg64_stats_events,
        "latency_quantiles_by_tool": q_latency_quantiles_by_tool,
        "textlen_buckets_by_role": q_textlen_buckets_by_role,
        "turncount_quantiles": q_turncount_quantiles,
        "hg64_downsample_lineitem": q_hg64_downsample_lineitem,
    }


def oracle_sql() -> dict[str, str]:
    li_sql = "SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem"
    return {
        "hg64_buckets_events": sqloracle.buckets_sql(_EVENTS_VALUE_SQL, "v", SIGBITS),
        "hg64_quantiles_events": sqloracle.quantiles_sql(
            _EVENTS_VALUE_SQL, "v", SIGBITS, QSWEEP, ["event_type"]
        ),
        "hg64_ranks_events": sqloracle.ranks_sql(_EVENTS_VALUE_SQL, "v", SIGBITS, _RANK_PROBES),
        "hg64_stats_events": sqloracle.stats_sql(_EVENTS_VALUE_SQL, "v", SIGBITS, ["event_type"]),
        "latency_quantiles_by_tool": sqloracle.quantiles_sql(
            _LATENCY_BASE_SQL, "latency_us", SIGBITS, QSWEEP, ["tool"]
        ),
        "textlen_buckets_by_role": sqloracle.buckets_sql(_TEXTLEN_BASE_SQL, "v", SIGBITS, ["role"]),
        "turncount_quantiles": sqloracle.quantiles_sql(
            _TURNS_BASE_SQL, "v", SIGBITS, [0.1, 0.5, 0.9, 0.99]
        ),
        "hg64_downsample_lineitem": sqloracle.buckets_sql(li_sql, "v", 4),
    }
