"""Production job: new-snapshot INTAKE TRIAGE — score an incoming corpus
drop against the reference corpus, filter contaminated documents, and
rebalance what survives toward a target language mixture, runnable via
spark-submit at any cluster size:

    zip -r hg64spark.zip hg64spark
    spark-submit --master <cluster> \\
        --py-files hg64spark.zip \\
        jobs/intake_corpus.py \\
        --ref s3://bucket/corpus/current/    # parquet with (doc_id, text, lang, source)
        --new s3://bucket/intake/drop42/
        --max-coverage 0.9                   # drop docs whose k-grams are >= 90% already-seen
        --target en=4,es=2,de=1,fr=1,zh=1    # output language mixture
        --output /path/intake_out

Writes under --output:
  coverage/  (doc_id, n_grams, n_seen, seen_frac) for every incoming doc
  kept/      the accepted, mixture-rebalanced rows (doc_id, text, lang, source)
plus a one-line JSON summary: the estimated corpus-level Jaccard between
the drop and the reference (64-perm MinHash — "how much of this crawl do
we already have?"), the contamination-drop count, and per-language kept
counts.

Scale shape (see the operator docstrings): `corpus_minhash_sim` collapses
each side to a 64-component signature (shuffle bounded by groups x perms,
never shingles); `ref_coverage` joins 8-byte hashed gram keys with no
self-join (no DF cap needed — fan-out equals the natural probe stream);
`sample_to_mixture` derives thresholds on a <= G-row counts frame and
broadcasts them, so the kept-row side never shuffles.  Nothing in the job
collects anything data-sized to the driver.
"""

from __future__ import annotations

import argparse
import json
import time


def parse_target(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        try:
            w = float(v)
        except ValueError:
            w = None
        if not k or not v or w is None:
            raise SystemExit(f"bad --target entry {part!r}; want lang=weight,...")
        out[k.strip()] = w
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True, help="reference corpus parquet dir")
    ap.add_argument("--new", required=True, help="incoming snapshot parquet dir")
    ap.add_argument("--max-coverage", type=float, default=0.9,
                    help="drop docs with seen_frac >= this (contamination filter)")
    ap.add_argument("--target", required=True,
                    help="target mixture, e.g. en=4,es=2,de=1")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    if not (0.0 < args.max_coverage <= 1.0):
        raise SystemExit(f"--max-coverage must be in (0, 1], got {args.max_coverage}")
    target = parse_target(args.target)

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("hg64spark-intake").getOrCreate()

    from hg64spark import dataops

    ref = spark.read.parquet(args.ref)
    new = spark.read.parquet(args.new)
    for side, df in (("--ref", ref), ("--new", new)):
        missing = {"doc_id", "text", "lang"} - set(df.columns)
        if missing:
            raise SystemExit(f"{side} is missing columns {sorted(missing)}")
        if df.filter(F.col("doc_id").isNull()).limit(1).count():
            # the mixture sampler's hash drops NULL ids silently in both
            # engines — refuse up front instead (the diff_corpus discipline)
            raise SystemExit(f"{side} snapshot contains NULL doc_id rows")

    t0 = time.perf_counter()

    # Tokenize + shingle + md5-hash each corpus exactly ONCE: the hashed
    # gram streams are the job's dominant cost and feed BOTH the
    # corpus-level similarity estimate and the per-document coverage join
    # (the diff_corpus pay-for-the-scan-once discipline, applied to the
    # most expensive stage instead of re-deriving it per operator).
    from hg64spark.dataops import _tokhash_spark, raw_shingles

    new_h = (
        raw_shingles(new.select("doc_id", "text"))
        .select("doc_id", _tokhash_spark(F.col("sh")).alias("hh"))
        .localCheckpoint()
    )
    ref_h = (
        raw_shingles(ref.select("doc_id", "text"))
        .select(_tokhash_spark(F.col("sh")).alias("hh"))
        .localCheckpoint()
    )

    # 1. corpus-level overlap estimate: how much of the drop is already in
    #    the reference?  Two groups ('ref', 'new') -> ONE pair row.
    tagged = ref_h.select(F.lit("ref").alias("g"), "hh").unionByName(
        new_h.select(F.lit("new").alias("g"), "hh")
    )
    sim = dataops.corpus_minhash_sim_from_hashed(tagged).collect()  # <= 1 row
    jaccard_est = sim[0]["jaccard_est"] if sim else None

    # 2. per-document reference coverage over the same hashed streams;
    #    checkpointed — it feeds the parquet write AND the contamination
    #    filter
    cov = dataops.ref_coverage_from_hashed(new_h, ref_h).localCheckpoint()
    cov.write.mode("overwrite").parquet(f"{args.output}/coverage")

    # 3. contamination filter: docs at/above --max-coverage are dropped;
    #    docs with NO coverage row (shorter than the shingle width) carry
    #    no gram evidence and are kept
    flagged = cov.filter(F.col("seen_frac") >= args.max_coverage).select("doc_id")
    n_flagged = flagged.count()
    clean = new.join(flagged, "doc_id", "left_anti")

    # 4. rebalance the survivors toward the target mixture
    kept = dataops.sample_to_mixture(clean, "lang", target)
    kept.write.mode("overwrite").parquet(f"{args.output}/kept")

    kept_counts = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{args.output}/kept")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_new = new.count()  # parquet-metadata read
    print(
        json.dumps(
            {
                "job": "intake_corpus",
                "ref_new_jaccard_est": jaccard_est,
                "rows_incoming": n_new,
                "contaminated_dropped": n_flagged,
                "kept_counts_by_lang": kept_counts,
                "kept_total": sum(kept_counts.values()),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
