"""Production job: distribution monitoring over any parquet table,
runnable via spark-submit at any cluster size:

    zip -r hg64spark.zip hg64spark
    spark-submit --master <cluster> \\
        --py-files hg64spark.zip \\
        jobs/monitor_corpus.py \\
        --input  s3://bucket/events/        # parquet
        --value-col value --group-col source \\
        --weight-col n_tokens               # optional: weight-mass dists
        --output /path/out

Computes, in ONE pass over the data (a single keyed-count aggregate feeds
everything):

  * per-group hg64 TV drift vs the pooled distribution
    (`relational.hg64_tv_drift_from_counts`) — "is this source/day/shard
    distributed like the corpus?"
  * per-group KS statistic (`relational.hg64_ks_drift_from_counts`) — the
    sup-norm complement: the worst single CDF gap, the location-shift
    detector a diffuse TV cannot localize
  * per-group W1 earth-mover distance in bucket-index units
    (`relational.hg64_w1_drift_from_counts`) — the magnitude-aware
    complement: how FAR the mass moved, ~linear in log2(value)
  * pairwise histogram overlap coefficients (`hg64_overlap` shape over the
    same counts) — "which groups are interchangeable?"
  * per-group inter-quantile TRIMMED statistics
    (`relational.hg64_trimmed_stats_from_counts`, bounds --trim-qlo/--trim-qhi)
    — the robust mean the raw mean can't give on long-tailed data
  * global quantile band (p01/p50/p99, `hg64_quantiles_from_counts`)

and writes drift + ks + w1 + trimmed + overlap tables under --output plus
a one-line JSON summary (worst TV/KS/W1 groups, least-overlapping pair,
quantile band, global trimmed mean) —
bounded bytes to the driver at any input size.

Scale shape: everything downstream of the first aggregate operates on
<= groups x 1920 keyed-count rows; the input is scanned exactly once.
NULL group values are groups like any other (null-safe joins throughout);
values must be non-negative integers after the caller's own transform
(use --value-expr for an inline cast/scale).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir")
    ap.add_argument("--value-col", required=True)
    ap.add_argument(
        "--value-expr",
        default=None,
        help="optional SQL expression producing the non-negative BIGINT to "
        "sketch (default: CAST(<value-col> AS BIGINT))",
    )
    ap.add_argument("--group-col", required=True)
    ap.add_argument("--weight-col", default=None)
    ap.add_argument("--sigbits", type=int, default=5)
    ap.add_argument("--trim-qlo", type=float, default=0.05)
    ap.add_argument("--trim-qhi", type=float, default=0.95)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    # validate BEFORE the eager keyed-count pass: a bad bound must fail in
    # milliseconds, not after a full scan of a 100 TB input (the same
    # validate-up-front discipline as the drift numerator check)
    if not (0.0 <= args.trim_qlo <= args.trim_qhi < 1.0):
        raise SystemExit(
            f"need 0 <= --trim-qlo <= --trim-qhi < 1, got "
            f"({args.trim_qlo}, {args.trim_qhi})"
        )

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("hg64spark-monitor").getOrCreate()

    from hg64spark import relational

    vexpr = args.value_expr or f"CAST({args.value_col} AS BIGINT)"
    # weight cast to BIGINT explicitly: the drift/overlap monitors REQUIRE
    # integral counts (their exactness story) and reject doubles
    cols = [F.col(args.group_col).alias("g"), F.expr(vexpr).alias("v")] + (
        [F.col(args.weight_col).cast("long").alias("wt")] if args.weight_col else []
    )
    src = spark.read.parquet(args.input).select(*cols).filter("v IS NOT NULL")

    t0 = time.perf_counter()
    # ONE keyed-count aggregate; localCheckpoint so drift/overlap/quantiles
    # reuse the reduced frame (<= groups x 1920 rows) instead of re-scanning
    # the input three times
    counts = relational.hg64_counts(
        src, "v", ["g"], args.sigbits, weight_col="wt" if args.weight_col else None
    ).localCheckpoint()

    from hg64spark import keymath

    # decimal numerators throughout: the job's "runnable at any input size"
    # contract must not inherit the int64 guards' ceilings (2^62/n for
    # TV/KS, key_span-tightened — ~3 decades lower — for W1); decimal is
    # exact to ~1e38 and ~free here because every drift stat runs over the
    # <= groups x 1920-row counts frame, never over data
    drift = relational.hg64_tv_drift_from_counts(counts, "g", numerator="decimal")
    ks = relational.hg64_ks_drift_from_counts(counts, "g", numerator="decimal")
    w1 = relational.hg64_w1_drift_from_counts(
        counts, "g", numerator="decimal", key_span=keymath.nkeys(args.sigbits)
    )
    # overlap over the SAME counts frame via the library's retained-state
    # entry point — one algebra, job and library cannot drift; decimal
    # numerator like the drift stats above, else the first group pair with
    # n_a*n_b > 2^62 hits the int64 guard's raise_error and fails the job
    overlap = relational.hg64_overlap_from_counts(counts, "g", numerator="decimal")
    trimmed = relational.hg64_trimmed_stats_from_counts(
        counts, ["g"], args.sigbits, qlo=args.trim_qlo, qhi=args.trim_qhi
    )
    glob = counts.groupBy("hg64_key").agg(F.sum("count").alias("count"))
    band = relational.hg64_quantiles_from_counts(glob, [0.01, 0.5, 0.99], [], args.sigbits)
    gtrim = relational.hg64_trimmed_stats_from_counts(
        glob, [], args.sigbits, qlo=args.trim_qlo, qhi=args.trim_qhi
    )

    drift.write.mode("overwrite").parquet(f"{args.output}/drift")
    ks.write.mode("overwrite").parquet(f"{args.output}/ks")
    w1.write.mode("overwrite").parquet(f"{args.output}/w1")
    trimmed.write.mode("overwrite").parquet(f"{args.output}/trimmed")
    overlap.write.mode("overwrite").parquet(f"{args.output}/overlap")

    # zero-mass groups report tv / overlap NULL (see the library docstrings)
    # — exclude them from the min/max picks so the summary stays strict JSON
    # (json.dumps would otherwise emit non-RFC NaN/None comparisons)
    worst = drift.filter("tv IS NOT NULL").orderBy(F.desc("tv")).limit(1).collect()
    worst_ks = ks.filter("ks IS NOT NULL").orderBy(F.desc("ks")).limit(1).collect()
    worst_w1 = w1.filter("w1 IS NOT NULL").orderBy(F.desc("w1")).limit(1).collect()
    least = overlap.filter("overlap IS NOT NULL").orderBy("overlap").limit(1).collect()
    qs = {repr(r["q"]): int(r["value"]) for r in band.collect()}
    gt = gtrim.collect()
    print(
        json.dumps(
            {
                "job": "monitor_corpus",
                "n_groups": drift.count(),
                "worst_drift": (
                    {"group": worst[0]["g"], "tv": round(worst[0]["tv"], 6)} if worst else None
                ),
                "worst_ks": (
                    {"group": worst_ks[0]["g"], "ks": round(worst_ks[0]["ks"], 6)}
                    if worst_ks
                    else None
                ),
                "worst_w1": (
                    {"group": worst_w1[0]["g"], "w1": round(worst_w1[0]["w1"], 6)}
                    if worst_w1
                    else None
                ),
                "least_overlap": (
                    {
                        "pair": [least[0]["g_a"], least[0]["g_b"]],
                        "overlap": round(least[0]["overlap"], 6),
                    }
                    if least
                    else None
                ),
                "quantile_band": qs,
                "trimmed_mean": (
                    round(gt[0]["trimmed_mean"], 3) if gt else None
                ),
                "trim_bounds": [args.trim_qlo, args.trim_qhi],
                "weighted": bool(args.weight_col),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
