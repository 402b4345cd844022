"""Production job: corpus curation (dedup keep-first + quality filter +
optional deterministic sampling), runnable via spark-submit at any cluster
size:

    zip -r hg64spark.zip hg64spark
    spark-submit --master <cluster> \\
        --py-files hg64spark.zip \\
        jobs/curate_corpus.py \\
        --input  s3://bucket/documents/     # parquet with (doc_id, text)
        --min-tokens 20
        --max-stop-ratio 0.09
        --sample-pct 100                    # deterministic hash-bucket keep %
        --output /path/out

Emits the curated corpus plus a one-line JSON summary that includes the
token-count distribution of the OUTPUT as hg64 quantiles — the sketch is the
natural way to report a distribution from a 100 TB job (bounded bytes to the
driver, mergeable across reruns).

Scale shape (see hg64spark/dataops.py docstrings): keep-first is one hash
shuffle on md5(text); the quality metrics are whole-stage-codegen
expressions; sampling is a shuffle-free hash-bucket filter; the summary
sketch is the relational keyed-count plan whose shuffle is bounded by ~1920
counters regardless of corpus size.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet dir (doc_id, text)")
    ap.add_argument("--min-tokens", type=int, default=None)
    ap.add_argument("--max-stop-ratio", type=float, default=None)
    ap.add_argument("--sample-pct", type=int, default=100, help="deterministic keep percentage")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("hg64spark-curate").getOrCreate()

    from hg64spark import agg, dataops

    corpus = spark.read.parquet(args.input).select("doc_id", "text")

    t0 = time.perf_counter()
    kw = {}
    if args.min_tokens is not None:
        kw["min_tokens"] = args.min_tokens
    if args.max_stop_ratio is not None:
        kw["max_stop"] = args.max_stop_ratio
    kept = dataops.curate_corpus(corpus, **kw)
    if not 1 <= args.sample_pct <= 100:
        raise SystemExit(f"--sample-pct must be in [1, 100], got {args.sample_pct}")
    if args.sample_pct < 100:
        kept = kept.filter(dataops.sample_bucket("doc_id") < args.sample_pct)

    kept.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    # both counts are parquet-metadata reads (no filter, no projected
    # columns -> Spark answers count() from row-group footers, not a second
    # full data scan)
    n_in = spark.read.parquet(args.input).count()
    n_out = out.count()
    qdf = agg.hg64_quantiles(
        agg.hg64_agg(out.select(F.col("n_tokens").alias("v")), "v", [], 5),
        [],
        [0.1, 0.5, 0.9, 0.99],
    )
    quantiles = {str(r["q"]): int(r["value"]) for r in qdf.collect()}
    print(
        json.dumps(
            {
                "job": "curate_corpus",
                "rows_in": n_in,
                "rows_out": n_out,
                "token_count_quantiles": quantiles,
                "sec": round(time.perf_counter() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
