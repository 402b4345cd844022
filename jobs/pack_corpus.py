"""Production job: token-budget shard packing (optionally after chunking),
runnable via spark-submit at any cluster size:

    zip -r hg64spark.zip hg64spark
    spark-submit --master <cluster> \\
        --py-files hg64spark.zip \\
        jobs/pack_corpus.py \\
        --input  s3://bucket/documents/     # parquet with (doc_id, text)
        --budget 1048576                    # tokens per shard
        --chunk-tokens 4096 --stride 2048   # optional: pre-chunk long docs
        --output /path/out

Emits (doc_id, n_tokens, shard_id) — in the chunked form doc_id is the
composite "<source_doc_id>#<chunk_idx>"; recover the parts with
rsplit('#', 1), which is unambiguous even when source ids contain '#'
(chunk_idx is always the final all-digits segment) — partitioned BY
shard_id on disk, so each training shard is one directory, plus a
one-line JSON summary with the shard count and the per-shard token
distribution as hg64 quantiles (bounded bytes to the driver at any
corpus size).

Scale shape (see hg64spark/dataops.py docstrings): chunking is a
zero-Exchange fan-out; packing is the two-level distributed prefix sum
(range-bucket windows + a broadcast offset table, never a global
single-partition window over data); the summary sketch is the relational
keyed-count plan whose shuffle is bounded by ~1920 counters.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet dir (doc_id, text)")
    ap.add_argument("--budget", type=int, default=None, help="tokens per shard")
    ap.add_argument("--chunk-tokens", type=int, default=None, help="pre-chunk window (optional)")
    ap.add_argument("--stride", type=int, default=None, help="pre-chunk stride (with --chunk-tokens)")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    if args.stride is not None and args.chunk_tokens is None:
        # fail FAST: silently ignoring --stride would pack whole documents
        # and blow the shard budget, discovered only after the job
        ap.error("--stride requires --chunk-tokens")

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("hg64spark-pack").getOrCreate()

    from hg64spark import agg, dataops

    # NULL doc_id rows are dropped at the front door: pack_token_shards
    # excludes them anyway (md5(NULL) breaks the bucket join), and in the
    # chunked path concat_ws would silently collapse a NULL source id into
    # an ambiguous "#<idx>" composite before packing could see it
    corpus = (
        spark.read.parquet(args.input)
        .select("doc_id", "text")
        .filter(F.col("doc_id").isNotNull())
    )

    t0 = time.perf_counter()
    if args.chunk_tokens is not None:
        ckw = {"chunk_tokens": args.chunk_tokens}
        if args.stride is not None:
            ckw["stride"] = args.stride
        # chunks pack like docs under the composite "doc#chunk" unit id —
        # dataops.chunked_pack_units is the SAME helper the driver gate
        # (pack_chunked_corpus) runs, so this job's layout is oracle-gated
        units = dataops.chunked_pack_units(corpus, **ckw)
        out_df = dataops.pack_token_shards(
            units, **({"budget": args.budget} if args.budget is not None else {})
        )
    else:
        kw = {"budget": args.budget} if args.budget is not None else {}
        out_df = dataops.pack_token_shards(corpus, **kw)

    out_df.write.mode("overwrite").partitionBy("shard_id").parquet(args.output)
    # explicit schema: a zero-row effective input (empty glob / all-NULL
    # text) writes only _SUCCESS, and schema inference on that would throw
    # AFTER the write — the summary must still print
    out = spark.read.schema(out_df.schema).parquet(args.output)

    # ONE scan of the written output feeds the whole summary: the shard
    # aggregate is cached, shard count + row count come from one action
    # over it, and the quantile sketch reduces it to <= 1920 rows
    shard_tokens = out.groupBy("shard_id").agg(
        F.sum("n_tokens").alias("v"), F.count("*").alias("rows")
    )
    shard_tokens.cache()
    try:
        stats = shard_tokens.agg(
            F.count("*").alias("n_shards"),
            F.coalesce(F.sum("rows"), F.lit(0)).alias("rows_out"),
        ).collect()[0]
        qdf = agg.hg64_quantiles(agg.hg64_agg(shard_tokens, "v", [], 5), [], [0.1, 0.5, 0.9])
        quantiles = {str(r["q"]): int(r["value"]) for r in qdf.collect()}
    finally:
        shard_tokens.unpersist()
    print(
        json.dumps(
            {
                "job": "pack_corpus",
                "rows_out": stats["rows_out"],
                "n_shards": stats["n_shards"],
                "shard_token_quantiles": quantiles,
                "sec": round(time.perf_counter() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
