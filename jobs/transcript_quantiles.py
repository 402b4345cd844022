"""Production job: per-group hg64 latency/length quantiles over a transcript
table, runnable via spark-submit on any cluster size:

    zip -r hg64spark.zip hg64spark              # package the library
    spark-submit --master <cluster> \\
        --py-files hg64spark.zip \\
        jobs/transcript_quantiles.py \\
        --input  s3://bucket/transcripts/       # or --synthetic-convs N
        --metric latency_us --group tool \\
        --qs 0.5,0.9,0.99 --sigbits 5 \\
        --checkpoint /path/ckpt                 # optional: resumable
        --output /path/out

The same invocation works unchanged at N and 4N executors — the sketch merge
is exactly associative/commutative, so the results are identical (asserted by
tests/test_spark_pipeline.py partition-invariance).  Input may be parquet or
any table readable by the session's catalog (Iceberg in production — table
format is reader config, not code).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcript table path (parquet dir)")
    ap.add_argument("--synthetic-convs", type=int, help="generate N synthetic conversations instead")
    ap.add_argument("--metric", default="latency_us", choices=["latency_us", "text_len", "turn_count"])
    ap.add_argument("--group", default="tool", help="comma-separated group columns ('' = global)")
    ap.add_argument("--qs", default="0.5,0.9,0.99")
    ap.add_argument("--sigbits", type=int, default=5)
    ap.add_argument(
        "--checkpoint",
        help="checkpoint dir -> resumable, file-level replay. NOTE: derivations "
        "are computed per file (that's what makes replay exact), so for "
        "--metric latency_us/turn_count the input files must be partitioned "
        "by conv_id (no conversation spanning files) — the standard "
        "Iceberg bucket layout for transcript tables",
    )
    ap.add_argument("--salt-buckets", type=int, default=0, help="salted repartition width for skewed inputs")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("hg64spark-transcript-quantiles").getOrCreate()

    from hg64spark import agg, transcripts
    from hg64spark.checkpoint import CheckpointedSketchAgg
    from hg64spark.hg64 import HG64

    group_cols = [c for c in args.group.split(",") if c]
    if args.metric == "turn_count" and group_cols:
        ap.error("--metric turn_count aggregates per conversation and supports only "
                 "the global grouping; pass --group ''")
    qs = [float(q) for q in args.qs.split(",")]
    t0 = time.time()

    if args.synthetic_convs:
        t = transcripts.synthetic_transcripts(spark, n_convs=args.synthetic_convs, seed=42)
    elif args.input:
        t = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic-convs is required")

    def derive(df):
        if args.metric == "latency_us":
            return transcripts.with_latency(
                df.select("conv_id", "turn_idx", *(c for c in group_cols if c != "conv_id"), "ts")
            )
        if args.metric == "text_len":
            return df.select(*group_cols, F.length("text").alias("text_len"))
        return df.groupBy("conv_id").agg(F.count("*").alias("turn_count"))

    if args.checkpoint and args.input:
        files = sorted(glob.glob(f"{args.input.rstrip('/')}/*.parquet"))
        ck = CheckpointedSketchAgg(
            args.checkpoint, args.metric, group_cols, lambda: HG64(args.sigbits), HG64.deserialize
        )
        processed = ck.process(spark, files, derive=lambda df: derive(df))
        sketches = ck.result(spark)
        n_processed = len(processed)
    else:
        d = derive(t)
        if args.salt_buckets:
            d = agg.repartition_salted(d, group_cols or ["conv_id"], args.salt_buckets)
        sketches = agg.hg64_agg(d, args.metric, group_cols, args.sigbits)
        n_processed = -1

    result = agg.hg64_quantiles(sketches, group_cols, qs)
    result.write.mode("overwrite").parquet(args.output)
    n_rows = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "job": "transcript_quantiles",
                "metric": args.metric,
                "groups": group_cols,
                "rows_out": n_rows,
                "files_processed": n_processed,
                "sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
