"""Production job: near-duplicate detection over a document corpus, runnable
via spark-submit on any cluster size:

    zip -r hg64spark.zip hg64spark
    spark-submit --master <cluster> \\
        --py-files hg64spark.zip \\
        jobs/dedup_corpus.py \\
        --input  s3://bucket/documents/        # parquet with (doc_id, text)
        --method minhash                       # minhash | exact | substring | substring-rewrite
        --tau 0.8                              # jaccard threshold (minhash)
        --df-cap 256                           # hot-shingle skew cap
        --output /path/out

Emits the duplicate table plus a one-line JSON summary.  Scale shape (see
hg64spark/dataops.py docstrings): the MinHash pair search is a banded
equi-join with candidate-only exact-Jaccard verification — never an O(n^2)
cross join — and the document-frequency cap keeps one stop-phrase shingle
from skewing a join partition.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet dir (doc_id, text)")
    ap.add_argument(
        "--method",
        default="minhash",
        choices=["minhash", "exact", "substring", "substring-rewrite"],
    )
    ap.add_argument("--tau", type=float, default=None, help="jaccard threshold (minhash)")
    ap.add_argument("--df-cap", type=int, default=None, help="shingle document-frequency cap")
    ap.add_argument(
        "--substr-l", type=int, default=None,
        help="min repeated span length in tokens (substring methods)",
    )
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"hg64spark-dedup-{args.method}").getOrCreate()

    from hg64spark import dataops

    corpus = spark.read.parquet(args.input).select("doc_id", "text")

    t0 = time.perf_counter()
    if args.method == "exact":
        from pyspark.sql import Window, functions as F

        # NULL text would hash to NULL and cluster every text-less doc into
        # one giant fake duplicate group — exclude them
        w = Window.partitionBy(F.md5("text"))
        out = (
            corpus.filter(F.col("text").isNotNull())
            .select("doc_id", F.count("*").over(w).alias("dup_count"))
            .filter("dup_count > 1")
        )
    elif args.method in ("substring", "substring-rewrite"):
        # ExactSubstr dedup: repeated >= 2x L-token spans across the corpus
        # (substring = emit the span table for audit; substring-rewrite =
        # emit the cleaned corpus with the spans cut out)
        l = dataops.SUBSTR_L if args.substr_l is None else args.substr_l
        # no NULL-text filter here: NULL/short docs simply produce no spans,
        # and the rewrite passes them through whole — filtering would
        # silently DROP them from the emitted cleaned corpus
        if args.method == "substring":
            out = dataops.substring_spans(corpus, l)
        else:
            out = dataops.substring_rewrite(corpus, l)
    else:
        tau = dataops.NEARDUP_TAU if args.tau is None else args.tau
        # the banding (32 bands x 2 rows) is tuned for tau >= ~0.5; at lower
        # thresholds the candidate stage starts missing just-above-threshold
        # pairs — surface the miss probability instead of silently losing
        # recall (fix: more hashes/bands, re-tune r for the chosen tau)
        miss_p = (1.0 - tau**2) ** dataops.LSH_BANDS
        if miss_p > 0.01:
            print(
                json.dumps(
                    {
                        "warning": "LSH banding recall at this tau",
                        "tau": tau,
                        "pair_miss_probability_at_tau": round(miss_p, 4),
                    }
                ),
                file=sys.stderr,
            )
        out = dataops.minhash_neardup_pairs(corpus, tau=tau, df_cap=args.df_cap)

    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {"job": "dedup_corpus", "method": args.method, "rows_out": n, "sec": round(time.perf_counter() - t0, 2)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
