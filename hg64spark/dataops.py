"""Training-data-pipeline operators over the ``documents`` / ``embeddings``
tables: text analysis, deduplication (exact, n-gram Jaccard, MinHash+LSH,
SimHash), and similarity search (brute-force cosine top-k + LSH-bucketed).

Every operator is defined twice — a Spark DataFrame implementation and a
DuckDB oracle — with the math arranged so both produce bit-identical results:

* hashes come from md5 prefixes (``conv(substr(md5(x),1,15),16,10)`` ==
  DuckDB ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``, verified) except the
  MinHash/LSH *candidate generation*, which uses Spark's xxhash64 — its
  *output* is still exactly gated because candidates are verified against the
  exact n-gram Jaccard, whose threshold set the oracle reproduces;
* similarity uses fixed-point embeddings (``floor(x*1e6 + 0.5)`` -> int64),
  so dot products are exact integer arithmetic in both engines;
* the corpus for near-dup operators is augmented with deterministic planted
  near-duplicates (each doc re-emitted at doc_id+2^40 with its last 3
  tokens dropped, built with identical expressions in both engines) because
  the synthetic documents have no natural near-dups.

Scale notes per operator are in the docstrings; the shared theme: shingle /
token explosion happens JVM-side (higher-order array functions, codegen),
self-joins are equi-joins on shingle/band/bucket keys that Spark shuffles by
key (AQE-skew-splittable), and nothing row-wise crosses into Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — pandas_udf type hints resolve against module globals
from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from hg64spark import io
from hg64spark.localrel import local_rows_df

SHINGLE_K = 5
#: id offset for planted near-duplicates in the augmented test corpora —
#: far above any real doc_id/vec_id (a +100000 offset would collide with
#: genuine ids once a table passes 100k rows)
PLANT_OFFSET = 1 << 40
NEARDUP_TAU = 0.5
MINHASH_N = 64
# r = 2 rows per band: the banding threshold (1/b)^(1/r) ~ 0.18, so pairs at
# tau = 0.5 are caught with prob 1-(1-0.25)^32 ~ 0.9999 (and deterministically
# at sf0.01: measured 600/600 recall with exactly 0 false candidates)
LSH_BANDS = 32
STOPWORDS = ("the", "a")

# ------------------------------------------------------------------ corpora


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return io.read_table(spark, sf_dir, "documents")


def augmented_corpus(
    spark: SparkSession, sf_dir: str, offset: int = PLANT_OFFSET
) -> DataFrame:
    """documents plus a planted near-duplicate of every doc (last 3 tokens
    dropped, doc_id+offset).  ``offset`` defaults ABOVE the id domain; the
    keep-best gate passes -PLANT_OFFSET so the degraded copy holds the
    cluster-MIN id instead.  The engine-sensitive drop-last-3 slice lives
    here and in :func:`_augmented_sql` ONLY — parameterizing the offset
    (rather than copying the pair) keeps it that way."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    copies = d.select(
        (F.col("doc_id") + F.lit(int(offset))).alias("doc_id"),
        F.expr("array_join(slice(split(text,' '), 1, size(split(text,' '))-3), ' ')").alias("text"),
    )
    return d.unionAll(copies)


def _augmented_sql(offset: int = PLANT_OFFSET) -> str:
    """DuckDB mirror of :func:`augmented_corpus` — same single-source rule."""
    return f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + ({int(offset)}) AS doc_id,
           array_to_string(l[1:len(l)-3], ' ') AS text
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
"""


AUGMENTED_SQL = _augmented_sql()


def raw_shingles(corpus: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """Word k-gram shingles per doc WITHOUT the distinct: the input for
    consumers that are duplicate-insensitive (min-hash signatures) — skipping
    the distinct skips a full shuffle of the shingle stream.

    The token array is projected ONCE before the explode: the inline form
    evaluated split(text, ' ') three times per row (filter + sequence bound +
    slice source), and Generate subtrees get no codegen subexpression
    elimination — per-task work, guide §1.2 step 2."""
    return (
        corpus.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
        .filter(F.size("__toks") >= k)
        .select(
            "doc_id",
            "__toks",
            F.explode(F.expr(f"sequence(1, size(__toks) - {k - 1})")).alias("__i"),
        )
        .select(
            "doc_id",
            F.expr(f"array_join(slice(__toks, __i, {k}), ' ')").alias("sh"),
        )
    )


def shingles(corpus: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """Distinct word k-gram shingles per doc: (doc_id, sh)."""
    return raw_shingles(corpus, k).distinct()


def _raw_shingles_sql(base: str, k: int = SHINGLE_K) -> str:
    """Non-distinct shingle stream (the SQL twin of :func:`raw_shingles`) —
    the ONE place the k-gram slice/range index arithmetic lives, so the
    distinct and multiplicity-sensitive oracles cannot drift apart."""
    return f"""
        SELECT doc_id, unnest([array_to_string(l[i:i+{k - 1}], ' ')
                               FOR i IN range(1, len(l) - {k - 2})]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM ({base}) WHERE len(string_split(text,' ')) >= {k})
    """


def _shingles_sql(base: str, k: int = SHINGLE_K) -> str:
    return f"""
    SELECT DISTINCT doc_id, sh FROM (
        {_raw_shingles_sql(base, k)}
    )
    """


#: document-frequency cap on shingles entering any pair self-join: a single
#: stop-phrase shingle shared by 10^6 docs would otherwise create a 10^12-row
#: join partition.  Similarity is defined over the capped shingle space
#: (standard stop-gram removal), identically in Spark and the DuckDB oracle.
SHINGLE_DF_CAP = 256


def rare_shingle_set(corpus: DataFrame, k: int = SHINGLE_K, df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    """The shingles whose document frequency is within the cap — the
    semi-join filter every skew-sensitive consumer applies."""
    s = shingles(corpus, k)
    return s.groupBy("sh").agg(F.count("*").alias("df")).filter(F.col("df") <= df_cap).select("sh")


def hot_shingle_set(corpus: DataFrame, k: int = SHINGLE_K, df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    """The OVER-cap shingles — tiny by construction (<= |doc-shingle
    pairs| / cap, zipfian in practice), which is what makes the anti-join
    form of the cap broadcastable (see hashed_shingles)."""
    s = shingles(corpus, k)
    return s.groupBy("sh").agg(F.count("*").alias("df")).filter(F.col("df") > df_cap).select("sh")


def capped_shingles(corpus: DataFrame, k: int = SHINGLE_K, df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    """Shingles minus those appearing in more than ``df_cap`` documents —
    the skew-safe input to every shingle self-join.  One extra groupBy over
    the shingle stream (partial-aggregated map-side), then a broadcast
    ANTI join against the tiny hot set — set-identical to the old semi
    join against the rare set (complement memberships, sh never NULL) but
    map-side, so the shingle stream is not re-exchanged by sh and no join
    partition concentrates a hot shingle (hashed_shingles docstring)."""
    return shingles(corpus, k).join(F.broadcast(hot_shingle_set(corpus, k, df_cap)), "sh", "left_anti")


def _keyed_shingles_sql(base: str, k: int = SHINGLE_K, hashed: bool = False) -> str:
    """Distinct per-doc shingle stream, keyed either by the raw shingle
    string or by its 60-bit md5-prefix hash — both as a column named ``sh``
    so every downstream generator has exactly one body (the two key spaces
    must never drift apart)."""
    if not hashed:
        return _shingles_sql(base, k)
    return (
        f"SELECT DISTINCT doc_id, {_TOKHASH_SQL.format(x='sh')} AS sh "
        f"FROM ({_shingles_sql(base, k)})"
    )


def _capped_shingles_sql(
    base: str, k: int = SHINGLE_K, df_cap: int = SHINGLE_DF_CAP, hashed: bool = False
) -> str:
    s = _keyed_shingles_sql(base, k, hashed)
    return f"""
    SELECT doc_id, sh FROM ({s})
    WHERE sh IN (SELECT sh FROM ({s}) GROUP BY sh HAVING count(*) <= {df_cap})
    """


# The exact-Jaccard pair computation, shared by several operators.
def jaccard_pairs(corpus: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_a, doc_b, jaccard) for every pair sharing >= 1 (df-capped)
    shingle.

    Scale shape: |shingles| ~ tokens per doc; the self-equi-join shuffles by
    shingle key, and the DF cap removes every shingle hot enough to skew a
    join partition before the join runs."""
    s = capped_shingles(corpus, k)
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        s.alias("x")
        .join(s.alias("y"), "sh")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")).cast("double")).alias(
                "jaccard"
            ),
        )
    )


def _jaccard_pairs_sql(
    base: str, k: int = SHINGLE_K, df_cap: int = SHINGLE_DF_CAP, hashed: bool = False
) -> str:
    return f"""
    WITH s AS ({_capped_shingles_sql(base, k, df_cap, hashed)}),
    sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
        FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    """


# --------------------------------------------------------------- text ops

#: md5-prefix 60-bit token hash, identical in Spark and DuckDB (verified)
def _tokhash_spark(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_TOKHASH_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics per document: token count, type count, type-token
    ratio, stopword ratio, and a composite quality score — all built-ins,
    whole-stage codegen, no shuffle beyond the final projection."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    stopset = ",".join(f"'{s}'" for s in STOPWORDS)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
        F.expr(f"size(filter(split(text,' '), x -> x IN ({stopset})))").cast("long").alias("n_stop"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")).alias("ttr"),
        (
            F.expr(f"size(filter(split(text,' '), x -> x IN ({stopset})))").cast("double")
            / F.size(toks).cast("double")
        ).alias("stop_ratio"),
    )


Q_TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       CAST(len(l) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(l)) AS BIGINT) AS n_types,
       CAST(len(list_filter(l, x -> x IN ({",".join(f"'{s}'" for s in STOPWORDS)}))) AS BIGINT) AS n_stop,
       CAST(len(list_distinct(l)) AS DOUBLE) / CAST(len(l) AS DOUBLE) AS ttr,
       CAST(len(list_filter(l, x -> x IN ({",".join(f"'{s}'" for s in STOPWORDS)}))) AS DOUBLE)
           / CAST(len(l) AS DOUBLE) AS stop_ratio
FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
"""


#: language-model vocabulary cap: top-K tokens per language by frequency
#: (deterministic tiebreak), so the broadcast model stays bounded no matter
#: how large the training corpus grows — an uncapped vocab over a 100 TB
#: corpus would not be broadcastable
LANGID_VOCAB_K = 4096
#: salt fan-out for the two-phase per-language top-K vocabulary cut: the
#: global ranking window sees at most LANGID_SALTS x LANGID_VOCAB_K rows per
#: language instead of the language's full distinct-token set
LANGID_SALTS = 32


def salted_topk(
    df: DataFrame, part_col: str, order_by: list, salt_col: str, k: int, salts: int = 32
) -> DataFrame:
    """Exact top-k rows per ``part_col`` under ``order_by`` without a serial
    per-partition sort: local top-k per (part, hash-salt of ``salt_col``),
    then a global ranking window over the <= ``salts`` x k survivors.
    Exact because any row in the global top-k is necessarily in its
    salt-group's local top-k.  ``order_by`` must be a total order (include a
    unique tiebreak column) for the result to be deterministic; raise
    ``salts`` when a single salt bucket's rows would still overwhelm one
    task."""
    # pmod, not abs(...)%: abs(Long.MIN_VALUE) stays negative in non-ANSI
    # semantics and % keeps the dividend sign, which would mint a 33rd salt
    # bucket for an input hashing exactly to Long.MIN_VALUE
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_col), F.lit(salts)).cast("int"))
    w_local = Window.partitionBy(part_col, "__salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("__rk", F.row_number().over(w_local))
        .filter(F.col("__rk") <= k)
        .drop("__rk", "__salt")
    )
    w_global = Window.partitionBy(part_col).orderBy(*order_by)
    return (
        survivors.withColumn("__rk", F.row_number().over(w_global))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def topk_tokens_per_lang(counts: DataFrame, k: int = LANGID_VOCAB_K) -> DataFrame:
    """Exact top-k (cnt desc, tok asc) rows per ``cand`` from a
    (cand, tok, cnt) frame, without a serial per-language sort."""
    return salted_topk(counts, "cand", [F.desc("cnt"), F.asc("tok")], "tok", k, salts=LANGID_SALTS)


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained token-frequency language ID: score(doc, lang) = sum
    over doc tokens (with multiplicity) of that token's frequency in lang's
    corpus (model capped to the top LANGID_VOCAB_K tokens per language);
    predict the argmax (integer scores — exactly reproducible).  Joins are
    broadcastable because the cap bounds the model at K x #langs rows."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("tok"))
    # two-phase exact top-K per language: a single `row_number OVER
    # (PARTITION BY lang)` would sort a language's ENTIRE distinct-token set
    # on one task (10^8+ rows at web scale — the one serial stage in this
    # family).  Instead: local top-K per (lang, salt-of-token), then global
    # top-K over <= LANGID_SALTS x K survivors per language.  Exact, because
    # any token in the global top-K is necessarily in its salt-group's local
    # top-K; the global window now sorts a BOUNDED set regardless of corpus
    # size.  Result is identical to the naive single window (tested), so the
    # oracle keeps the straightforward form.
    counts = (
        toks.groupBy("lang", "tok")
        .agg(F.count("*").alias("cnt"))
        .withColumnRenamed("lang", "cand")
    )
    freq = topk_tokens_per_lang(counts, LANGID_VOCAB_K)
    scored = (
        toks.select("doc_id", "tok")
        .join(F.broadcast(freq), "tok")
        .groupBy("doc_id", "cand")
        .agg(F.sum("cnt").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand"))
    pred = scored.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    # LEFT join from the docs side: a doc whose tokens all fall outside the
    # capped vocabulary still gets a row (predicted 'und'), preserving the
    # one-prediction-per-document contract the cap would otherwise break
    return (
        d.select("doc_id", "lang").join(pred, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cand"), F.lit("und")).alias("predicted_lang"),
            F.col("lang").alias("actual_lang"),
        )
    )


Q_TEXT_LANGID_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
freq AS (
    SELECT cand, tok, cnt FROM (
        SELECT lang AS cand, tok, count(*) AS cnt,
               row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tok ASC) AS rk
        FROM toks GROUP BY lang, tok
    ) WHERE rk <= {LANGID_VOCAB_K}
),
scored AS (
    SELECT t.doc_id, f.cand, sum(f.cnt) AS score
    FROM toks t JOIN freq f ON t.tok = f.tok
    GROUP BY 1, 2
),
pred AS (
    SELECT doc_id, cand,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rn
    FROM scored
)
SELECT d.doc_id, coalesce(p.cand, 'und') AS predicted_lang, d.lang AS actual_lang
FROM documents d LEFT JOIN (SELECT * FROM pred WHERE rn = 1) p ON p.doc_id = d.doc_id
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint from shingle hashes: (min hash, xor of hashes) —
    an order-independent 2x60-bit signature (equal for exact duplicates,
    cheap pre-filter for near-dups)."""
    s = shingles(_docs(spark, sf_dir).select("doc_id", "text"))
    h = s.select("doc_id", _tokhash_spark(F.col("sh")).alias("h"))
    return h.groupBy("doc_id").agg(
        F.min("h").alias("fp_min"), F.expr("bit_xor(h)").alias("fp_xor")
    )


Q_TEXT_FINGERPRINT_SQL = f"""
WITH s AS ({_shingles_sql("SELECT doc_id, text FROM documents")}),
h AS (SELECT doc_id, {_TOKHASH_SQL.format(x="sh")} AS h FROM s)
SELECT doc_id, min(h) AS fp_min, bit_xor(h) AS fp_xor FROM h GROUP BY doc_id
"""


def q_token_count_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hg64 histogram of per-document token counts — the sketch library and
    the data ops composing."""
    from hg64spark import agg

    d = _docs(spark, sf_dir).select(F.size(F.split("text", " ")).cast("long").alias("v"))
    sk = agg.hg64_agg(d, "v", [], 5)
    return agg.hg64_buckets(sk, [])


def token_count_hist_sql() -> str:
    from hg64spark import sqloracle

    return sqloracle.buckets_sql(
        "SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v FROM documents", "v", 5
    )


# ------------------------------------------------------------------- dedup


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash over the augmented corpus (the planted
    copies are near- not exact dups, so only self-groups appear; the gate
    checks the group arithmetic, not a lucky collision).  At scale: a single
    hash-shuffle on md5(text)."""
    c = augmented_corpus(spark, sf_dir)
    w = Window.partitionBy(F.md5("text"))
    return c.select(
        "doc_id", F.md5("text").alias("text_md5"), F.count("*").over(w).alias("dup_count")
    )


Q_DEDUP_EXACT_SQL = f"""
SELECT doc_id, md5(text) AS text_md5,
       count(*) OVER (PARTITION BY md5(text)) AS dup_count
FROM ({AUGMENTED_SQL})
"""


def q_dedup_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most similar pairs by exact word-5-gram Jaccard over the
    augmented corpus (deterministic tiebreak).

    Deliberately stays on STRING shingle keys: this is the exact-similarity
    baseline the hashed operators are validated against, so it must not
    share their (hash-space) definition.  It is the one shingle operator not
    meant for 100 TB — at scale you run dedup_minhash_lsh (hashed keys,
    banded candidates) and reserve this for sampled audits."""
    pairs = jaccard_pairs(augmented_corpus(spark, sf_dir))
    return pairs.orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b")).limit(50)


Q_DEDUP_NGRAM_SQL = f"""
SELECT * FROM ({_jaccard_pairs_sql(AUGMENTED_SQL)})
ORDER BY jaccard DESC, doc_a ASC, doc_b ASC LIMIT 50
"""


def hashed_shingles(
    corpus: DataFrame, k: int = SHINGLE_K, df_cap: int = SHINGLE_DF_CAP
) -> tuple[DataFrame, DataFrame]:
    """(distinct per-doc 60-bit shingle hashes, OVER-cap hot-key set).

    Every downstream shuffle and self-join then carries an 8-byte BIGINT key
    instead of a ~5-word shingle string — at 100 TB the verification join's
    shuffle volume drops ~5x.  The hash is the md5-prefix ``_tokhash_spark``,
    reproduced exactly by the DuckDB oracle, so similarity is *defined* over
    the hashed shingle space identically in both engines (a 60-bit collision
    — ~|S|^2/2^61, negligible — merges the same two shingles in both).

    The DF cap is applied by the caller as a broadcast ANTI join against
    the hot keys (df > cap) — set-identical to a semi join against the
    rare keys (df <= cap; every stream key is observed, and hh is never
    NULL, so the two memberships are complements), but strictly cheaper at
    both scales: the hot set is tiny by construction (<= |distinct
    doc-shingle pairs| / cap keys, zipfian in practice — stop-phrases),
    so the anti join is map-side.  That removes the full re-exchange of
    the distinct shingle stream by hh that the semi join paid, AND the
    skew it invited — a semi join partitions by hh, concentrating exactly
    the hot shingles the cap exists to kill; broadcasting just the hot
    keys is the guide §2.5 skew-kill."""
    hdist = (
        raw_shingles(corpus, k)
        .select("doc_id", _tokhash_spark(F.col("sh")).alias("hh"))
        .distinct()
    )
    hot = (
        hdist.groupBy("hh").agg(F.count("*").alias("df")).filter(F.col("df") > df_cap).select("hh")
    )
    return hdist, hot


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (64 hashes) + LSH banding (32 bands x 2 rows) near-dup
    detection, verified: candidate pairs from band collisions are checked
    against the exact hashed-shingle Jaccard and emitted iff >= tau.  The
    oracle is the exhaustive exact-Jaccard pair set (same hashed shingle
    space, same tau), so the gate requires the LSH pipeline to achieve 100%
    recall AND the verification to kill every false candidate —
    deterministic given the fixed hash seeds."""
    return minhash_neardup_pairs(augmented_corpus(spark, sf_dir))


def minhash_neardup_pairs(
    corpus: DataFrame, tau: float | None = None, df_cap: int | None = None
) -> DataFrame:
    """(doc_a, doc_b, jaccard >= tau) over any (doc_id, text) corpus — the
    library form used by the driver query and by ``jobs/dedup_corpus.py``.

    Scale shape: signatures are one groupBy over (doc, shingle) rows; band
    join shuffles (band_id, band_hash) keys; candidate verification touches
    only candidate pairs, never the O(n^2) cross join."""
    tau = NEARDUP_TAU if tau is None else tau
    df_cap = SHINGLE_DF_CAP if df_cap is None else df_cap
    # Everything downstream runs over 60-bit HASHED shingles (8-byte join
    # keys; similarity is defined over the hashed space, oracle-mirrored —
    # see hashed_shingles).  ONE hot-key broadcast (the anti-join DF cap)
    # feeds both the signature and verification branches: identical
    # subplans, so Spark's ReuseExchange dedupes the build.  The streams
    # themselves are recomputed per branch on purpose — measured faster than
    # .persist() (row-format caching breaks the codegen pipeline and costs
    # more than the re-explosion at this shape).
    hdist, hot = hashed_shingles(corpus, df_cap=df_cap)
    s = hdist.join(F.broadcast(hot), "hh", "left_anti")
    r = MINHASH_N // LSH_BANDS
    assert r == 2, "band assembly below is written for r=2 rows per band"
    # signatures in LONG format: explode the hash index and run ONE narrow
    # min-aggregate instead of 64 wide agg expressions — a 64-column agg
    # generates enormous codegen classes that fill the JVM code cache and
    # progressively disable JIT (measured 24s -> 125s over three calls);
    # the long shape partial-aggregates to #docs x 64 rows before the shuffle.
    # The signature branch reads the SAME df-capped distinct stream `s` as
    # the verification branch: MIN is duplicate-insensitive, so the distinct
    # changes no signature, and because the verification branch materializes
    # the distinct exchange anyway, AQE's stage reuse feeds this branch from
    # it — the corpus is tokenized+md5-hashed ONCE per run instead of twice
    # (plan-verified: the round-7 final plan carried two raw-shingle Generate
    # subtrees, this one carries one).  The 64 family members still rehash
    # the 8-byte hh instead of the ~5-word string.
    sig_stream = s
    # explode the CONSTANT index array first, hash after: building the
    # 64-long hash array per row materializes a fresh ArrayData per shingle
    # before the Generate, while exploding the constant-folded sequence
    # costs one shared array and moves the xxhash64 into the post-explode
    # codegen projection — measured 1.25s -> 0.72s to the band frame on the
    # gate corpus, byte-identical (i stays the INT sequence element, so
    # xxhash64(hh, i) hashes the same operand types)
    hashes = sig_stream.select(
        "doc_id", "hh", F.explode(F.expr(f"sequence(0, {MINHASH_N - 1})")).alias("i")
    ).select("doc_id", "i", F.xxhash64("hh", "i").alias("h"))
    # ONE shuffle builds the band hashes: min over (doc, band, parity-of-i)
    # equals the per-i minhash because band i-range is {2*band, 2*band+1}
    bands = (
        hashes.groupBy("doc_id", (F.col("i") / r).cast("int").alias("band"))
        .agg(
            F.min(F.when(F.col("i") % r == 0, F.col("h"))).alias("m0"),
            F.min(F.when(F.col("i") % r == 1, F.col("h"))).alias("m1"),
        )
        .select("doc_id", "band", F.xxhash64("m0", "m1", "band").alias("bh"))
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bh"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify ONLY the candidates (that's the point of LSH): intersect the two
    # candidates' shingle sets via a semi-structured join, never the full
    # O(pairs) cross — the exact-Jaccard filter then kills false candidates
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(s.alias("xs"), F.col("doc_a") == F.col("xs.doc_id"))
        .join(s.alias("ys"), (F.col("doc_b") == F.col("ys.doc_id")) & (F.col("xs.hh") == F.col("ys.hh")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    verified = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")).cast("double")).alias(
                "jaccard"
            ),
        )
    )
    return verified.filter(F.col("jaccard") >= tau)


Q_DEDUP_MINHASH_SQL = f"""
SELECT doc_a, doc_b, jaccard FROM ({_jaccard_pairs_sql(AUGMENTED_SQL, hashed=True)})
WHERE jaccard >= {NEARDUP_TAU}
"""

SIMHASH_BITS = 60
HAMMING_MAX = 8
#: pigeonhole banding: a pair at Hamming <= 8 differs in at most 8 of the 9
#: disjoint bit-bands, so it must agree EXACTLY on >= 1 band — the banded
#: equi-join is a lossless candidate generator for the <= 8 threshold
SIMHASH_BANDS = HAMMING_MAX + 1


def _simhash_band_bounds() -> list[tuple[int, int]]:
    """(bit_offset, width) per band: 60 bits over 9 bands -> 6x7 + 3x6."""
    base, rem = divmod(SIMHASH_BITS, SIMHASH_BANDS)
    widths = [base + (1 if i < rem else 0) for i in range(SIMHASH_BANDS)]
    return [(sum(widths[:i]), widths[i]) for i in range(SIMHASH_BANDS)]


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection: 60-bit signatures from md5-prefix token
    hashes (sign-sum per bit), pairs at Hamming distance <= 8.  Fully
    SQL-expressible, so the oracle recomputes the identical signatures (the
    oracle may pair exhaustively — it runs in DuckDB at test scale; the
    Spark plan must not).

    Scale shape: signature build is one grouped aggregation; pair search is
    pigeonhole-banded — Hamming <= 8 over 9 disjoint bands forces an exact
    match on >= 1 band, so candidates come from an equi-join on
    (band, band_bits) and the Hamming distance is verified on candidates
    only.  No theta-join anywhere: the plan stays SortMergeJoin /
    shuffled-hash, never CartesianProduct (asserted by
    tests/test_dataops.py)."""
    c = augmented_corpus(spark, sf_dir)
    toks = c.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = toks.select("doc_id", _tokhash_spark(F.col("tok")).alias("h"))
    # long format (one narrow agg, not 60 wide ones — see the minhash note on
    # codegen/code-cache blowup): explode the bit index, sum the signs per
    # (doc, bit), then assemble the signature with a single conditional sum
    # explode the constant bit-index sequence and compute the sign AFTER
    # (same trick as the minhash band build: no 60-element ArrayData
    # materialized per token hash)
    bits = h.select(
        "doc_id", "h", F.explode(F.expr(f"sequence(0, {SIMHASH_BITS - 1})")).alias("b")
    ).select(
        "doc_id",
        "b",
        F.expr("CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END").alias("sign"),
    )
    bit_sums = bits.groupBy("doc_id", "b").agg(F.sum("sign").alias("s"))
    sigs = bit_sums.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(1L, b)")).otherwise(F.lit(0))).alias("simhash")
    )
    band_arr = F.array(
        *[F.expr(f"(simhash >> {off}) & {(1 << w) - 1}") for off, w in _simhash_band_bounds()]
    )
    bands = sigs.select("doc_id", "simhash", F.posexplode(band_arr).alias("band", "bb"))
    # a near-dup pair can collide in several bands -> distinct BEFORE the
    # (cheap) bit_count so each pair is verified once
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bb"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
    )


_SIMHASH_SIG_SQL = f"""
    SELECT doc_id,
           {" + ".join(f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS))}
           AS simhash
    FROM (
        SELECT doc_id,
               {", ".join(f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(SIMHASH_BITS))}
        FROM (
            SELECT doc_id, {_TOKHASH_SQL.format(x="tok")} AS h
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM ({AUGMENTED_SQL}))
        )
        GROUP BY doc_id
    )
"""

Q_DEDUP_SIMHASH_SQL = f"""
WITH sigs AS ({_SIMHASH_SIG_SQL})
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(bit_count(CAST(xor(x.simhash, y.simhash) AS BIGINT)) AS BIGINT) AS hamming
FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
WHERE bit_count(CAST(xor(x.simhash, y.simhash) AS BIGINT)) <= {HAMMING_MAX}
"""


# -------------------------------------------------------------- similarity

N_PROBES = 5
TOPK = 10
#: embedding dimensionality of the test tables (array columns carry no
#: length in the Spark schema, so consumers that need it at plan time take
#: it as a constant, guarded at execution — see _band_codes_df)
EMB_DIM = 64
_SCALE = "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
_SCALE_SQL = "[CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT) FOR v IN embedding]"


def _scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = io.read_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.expr(_SCALE).alias("se"))


_DEC19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731


def _per_dim_sums(
    embs: DataFrame, group_col: str, vec_col: str, with_squares: bool = False
) -> DataFrame:
    """(g, j, s[, ss], n): per-(group, dimension) sums of the fixed-point
    vectors — the shared explode/aggregate stage of the embedding
    analytics operators, one map-side-combined groupBy bounded by G x dim.

    Integrity guard (plan-side): every dimension of a group must carry the
    IDENTICAL row count, and no component may be NULL — ragged vector
    lengths or NULL components would make per-dimension counts diverge and
    the single-n formulas downstream silently wrong (and order-dependent
    through first()).  Checked on the tiny G x dim frame, raise_error on
    violation.

    ``with_squares``: also emit ss = Σx², decimal-multiplied BEFORE the
    sum — dec(x)*dec(x) never overflows where an int64 x*x would abort at
    |component| > ~3034 raw units under ANSI."""
    # vec_col parameterizes the fixed-point expression (the module-level
    # _SCALE constant is pinned to the embeddings table's column name)
    scale = _SCALE.replace("embedding", vec_col, 1)
    # a NULL or empty vector produces no posexplode rows at all and would
    # otherwise be silently excluded from n uniformly across dimensions —
    # contradicting the fail-loudly contract; raise per-row BEFORE the
    # explode instead (explicit isNull test: under ANSI size(NULL) is NULL,
    # which would slip through a pure <= 0 comparison)
    se = embs.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.when(F.col(vec_col).isNull() | (F.size(F.col(vec_col)) <= 0),
               F.expr(f"CAST(raise_error('NULL or empty {vec_col} vector') AS "
                      "ARRAY<BIGINT>)"))
        .otherwise(F.expr(scale))
        .alias("se"),
    )
    aggs = [
        F.sum("x").alias("s"),
        F.count("*").alias("__n_rows"),
        F.count("x").alias("__n_vals"),
    ]
    if with_squares:
        aggs.insert(1, F.sum(_DEC19("x") * _DEC19("x")).alias("ss"))
    per_dim = se.select("g", F.posexplode("se").alias("j", "x")).groupBy("g", "j").agg(*aggs)
    from pyspark.sql import Window

    w = Window.partitionBy("g")
    wall = Window.partitionBy()  # the guarded frame is tiny (G x dim)
    # uniform within the group AND one vector length across the WHOLE
    # frame: the pairwise consumers join on the dimension index alone, and
    # two internally-uniform groups of different lengths would otherwise
    # silently restrict their dot/norm sums to the common dimension prefix
    ok = (
        (F.max("__n_rows").over(w) == F.min("__n_rows").over(w))
        & (F.col("__n_vals") == F.col("__n_rows"))
        & (F.max("j").over(w) == F.max("j").over(wall))
    )
    guarded = per_dim.withColumn(
        "n",
        F.when(ok, F.col("__n_rows")).otherwise(
            F.expr(
                "CAST(raise_error('embedding groups must have uniform vector "
                "length (one length across ALL groups) and no NULL "
                "components') AS LONG)"
            )
        ),
    ).drop("__n_rows", "__n_vals")
    return guarded


def embedding_centroid_drift(
    embs: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """(g_a, g_b, n_a, n_b, cos_centroid): cosine similarity between every
    pair of GROUP CENTROIDS in embedding space — domain-shift detection for
    the representation the models actually see (two sources whose token
    histograms look alike can still sit in different embedding regions;
    cos ~ 1: same region, cos ~ 0/negative: different).  The embedding
    companion of `hg64_overlap` (bucket histograms) and
    `corpus_minhash_sim` (lexical overlap).

    Exactness: vectors enter in the ANN family's fixed point
    (floor(x*1e6+0.5) int64), per-group component SUMS are exact int64
    (safe to ~9e12 rows/group at |x| <= 1), and cosine(sum_a, sum_b) ==
    cosine(mean_a, mean_b) (scale invariance) so means are never
    materialized.  Dot products of the big sum vectors use the drift
    family's decimal(38,0) numerators — exact to ~1e12 rows/group — then
    ONE pinned-op-order double step: dot / (sqrt(na2) * sqrt(nb2)); a
    zero-norm centroid yields NULL, not a crash.

    Scale shape: the heavy stage is one map-side-combined groupBy over
    (group, dim) — shuffle bounded by G x dim rows, independent of N; the
    pairwise stage is frame algebra on the G x dim sum table (same G
    caveat as `corpus_minhash_sim`)."""
    sums = _per_dim_sums(embs, group_col, vec_col)
    dec = _DEC19
    a = sums.select(
        F.col("g").alias("g_a"), "j", F.col("s").alias("sa"), F.col("n").alias("na")
    )
    b = sums.select(
        F.col("g").alias("g_b"), "j", F.col("s").alias("sb"), F.col("n").alias("nb")
    )
    pairs = (
        a.join(b, "j")
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(
            # first() is deterministic here: _per_dim_sums guarantees every
            # dimension of a group carries the identical n
            F.first("na").alias("n_a"),
            F.first("nb").alias("n_b"),
            F.sum(dec("sa") * dec("sb")).alias("dot"),
            F.sum(dec("sa") * dec("sa")).alias("na2"),
            F.sum(dec("sb") * dec("sb")).alias("nb2"),
        )
    )
    return pairs.select(
        "g_a",
        "g_b",
        "n_a",
        "n_b",
        (
            F.col("dot").cast("double")
            / F.nullif(
                F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double")),
                F.lit(0.0),
            )
        ).alias("cos_centroid"),
    )


def embedding_dispersion(
    embs: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """(g, n, dispersion): mean squared distance of a group's embeddings
    from their centroid — the embedding-space SPREAD per source, the
    single-group companion of :func:`embedding_centroid_drift` (pairwise
    centroid direction).  Near-zero dispersion flags representation
    collapse: a source whose documents all embed to the same point is
    near-duplicate-heavy or template-generated even when its token
    statistics look diverse.

    Exactness: E|x - mean|^2 = (n * Σ|x|^2 - |Σx|^2) / n^2 — component
    sums are exact int64 over the fixed-point vectors (safe to ~9e12
    rows/group); squared components are decimal-multiplied AND
    decimal-summed at the ROW level (int64 x·x would abort under ANSI at
    |component| > ~3034 raw units, and an int64 Σx² would cap at ~9e6
    rows/group — the one place the drift family's decimal discipline must
    apply on the data-sized aggregate, ~2x the cost of a long sum).  The
    combined numerator stays exact while n²·dim·10¹² ≤ 10³⁸ (~10¹¹
    rows/group; ANSI decimal overflow is loud past it); the denominator
    n·n and the final division are the only floating steps, each a single
    correctly-rounded op in pinned order.  Ragged vector lengths and NULL
    components fail loudly (see :func:`_per_dim_sums`), never skew n.
    Unit: squared fixed-point counts (components scaled by 1e6, so divide
    by 1e12 for raw-embedding units); comparisons between groups — the
    use case — are scale-free.

    Scale shape: identical to centroid drift — one map-side-combined
    groupBy bounded by G x dim, then per-group frame algebra."""
    dec = _DEC19
    per_dim = _per_dim_sums(embs, group_col, vec_col, with_squares=True)
    per_group = per_dim.groupBy("g").agg(
        # deterministic: _per_dim_sums guarantees a uniform n per group
        F.first("n").alias("n"),
        F.sum("ss").alias("ss_tot"),
        F.sum(dec("s") * dec("s")).alias("s2_tot"),
    )
    return per_group.select(
        "g",
        "n",
        (
            (
                dec("n") * F.col("ss_tot") - F.col("s2_tot")
            ).cast("double")
            # double-multiply the denominator: n*n as int64 would overflow
            # at ~3e9 rows/group, far below the numerator's documented
            # bound; one correctly-rounded multiply is engine-identical
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("dispersion"),
    )


def q_embedding_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-dispersion gate over the embeddings table; the
    oracle reproduces the integer/decimal numerator and the single double
    division in SQL."""
    e = io.read_table(spark, sf_dir, "embeddings")
    return embedding_dispersion(e.select("label", "embedding"), "label")


def _embedding_dispersion_sql() -> str:
    return f"""
    WITH se AS (
        SELECT label AS g, {_SCALE_SQL} AS se FROM embeddings
        WHERE label IS NOT NULL
    ),
    expl AS (
        SELECT g, u.j AS j, u.x AS x
        FROM (SELECT g, unnest([{{'j': i, 'x': se[i + 1]}}
                                FOR i IN range(len(se))]) AS u
              FROM se)
    ),
    per_dim AS (
        SELECT g, j, CAST(sum(x) AS BIGINT) AS s,
               sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS ss,
               count(*) AS n
        FROM expl GROUP BY 1, 2
    ),
    per_group AS (
        SELECT g, CAST(any_value(n) AS BIGINT) AS n,
               sum(ss) AS ss_tot,
               sum(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))) AS s2_tot
        FROM per_dim GROUP BY 1
    )
    SELECT g, n,
           CAST(CAST(n AS DECIMAL(19,0)) * ss_tot - s2_tot AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS dispersion
    FROM per_group
    """


def q_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-drift gate over the embeddings table's label groups; the
    oracle reproduces the fixed-point sums, decimal numerators, and the
    single double step in SQL."""
    e = io.read_table(spark, sf_dir, "embeddings")
    return embedding_centroid_drift(e.select("label", "embedding"), "label")


def _embedding_centroid_drift_sql() -> str:
    return f"""
    WITH se AS (
        SELECT label AS g, {_SCALE_SQL} AS se FROM embeddings
        WHERE label IS NOT NULL
    ),
    expl AS (
        SELECT g, u.j AS j, u.x AS x
        FROM (SELECT g, unnest([{{'j': i, 'x': se[i + 1]}}
                                FOR i IN range(len(se))]) AS u
              FROM se)
    ),
    sums AS (
        SELECT g, j, CAST(sum(x) AS BIGINT) AS s, count(*) AS n
        FROM expl GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.g AS g_a, b.g AS g_b,
               CAST(any_value(a.n) AS BIGINT) AS n_a,
               CAST(any_value(b.n) AS BIGINT) AS n_b,
               sum(CAST(a.s AS DECIMAL(19,0)) * CAST(b.s AS DECIMAL(19,0))) AS dot,
               sum(CAST(a.s AS DECIMAL(19,0)) * CAST(a.s AS DECIMAL(19,0))) AS na2,
               sum(CAST(b.s AS DECIMAL(19,0)) * CAST(b.s AS DECIMAL(19,0))) AS nb2
        FROM sums a JOIN sums b ON a.j = b.j AND a.g < b.g
        GROUP BY 1, 2
    )
    SELECT g_a, g_b, n_a, n_b,
           CAST(dot AS DOUBLE)
           / nullif(sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)), 0.0)
               AS cos_centroid
    FROM pairs
    """


# ------------------------------------------------------------- winnowing

WINNOW_W = 4  # window (in k-grams) per Schleimer/Wilkerson/Aiken winnowing


def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    the MOSS scheme): hash every word-k-gram by position, slide a window of
    WINNOW_W consecutive hashes, keep the window minimum — the selected
    distinct hashes are the fingerprint set, guaranteeing any shared run of
    >= k+W-1 tokens between two documents shares >= 1 fingerprint.

    Scale shape: one frame-window min per document (shuffle by doc_id,
    ordered scan within — documents are bounded-length, so no skew), then a
    distinct.  Identical frame semantics in the DuckDB oracle."""
    k = SHINGLE_K
    d = _docs(spark, sf_dir).select("doc_id", "text")
    # token array projected once (see raw_shingles): split ran 3x per row
    sh = (
        d.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
        .filter(F.size("__toks") >= k)
        .select(
            "doc_id",
            "__toks",
            F.posexplode(F.expr(f"sequence(1, size(__toks) - {k - 1})")).alias("pos", "__i"),
        )
        .select(
            "doc_id",
            "pos",
            F.expr(f"array_join(slice(__toks, __i, {k}), ' ')").alias("sh"),
        )
    )
    h = sh.select("doc_id", "pos", _tokhash_spark(F.col("sh")).alias("h"))
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    wm = h.select("doc_id", F.min("h").over(w).alias("fp"), F.count("*").over(w).alias("cnt"))
    return wm.filter(F.col("cnt") == WINNOW_W).select("doc_id", "fp").distinct()


Q_TEXT_WINNOW_SQL = f"""
WITH sh AS (
  SELECT doc_id, u.pos AS pos, u.sh AS sh
  FROM (SELECT doc_id,
               unnest([{{'pos': i, 'sh': array_to_string(l[i:i+{SHINGLE_K - 1}], ' ')}}
                       FOR i IN range(1, len(l) - {SHINGLE_K - 2})]) AS u
        FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents
              WHERE len(string_split(text,' ')) >= {SHINGLE_K}))
),
h AS (SELECT doc_id, pos, {_TOKHASH_SQL.format(x="sh")} AS h FROM sh),
wm AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS cnt
  FROM h)
SELECT DISTINCT doc_id, fp FROM wm WHERE cnt = {WINNOW_W}
"""


# --------------------------------------------------------- token counting

#: BPE-ish pre-tokenizer: letter runs / digit runs / single non-alnum marks —
#: the GPT-2-style split that approximates subword token counts far better
#: than whitespace for budgeting.  regexp_extract_all has identical semantics
#: in Spark (Java regex) and DuckDB (RE2) for this pattern class (verified).
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token budgets: whitespace tokens vs BPE-ish regex tokens
    — both pure codegen built-ins, no shuffle."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)")).cast("long").alias("n_bpe_tokens"),
    )


Q_TOKEN_COUNT_BPE_SQL = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""


# ------------------------------------------------- embedding-cosine dedup

#: cosine threshold for embedding near-dup: planted copies sit at ~0.9999,
#: the max NATURAL pair cosine in the synthetic isotropic embeddings is ~0.51
#: (measured at every sf), so 0.9 separates totally and the oracle's
#: exhaustive scan must agree exactly
COSDUP_TAU = 0.9


def _aug_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point embeddings plus a planted near-duplicate of each vector
    (vec_id+PLANT_OFFSET, each component nudged by v % 97 — ~1e-4 relative), the
    embedding analogue of the text corpus's planted near-dups, identical
    expression in the DuckDB oracle."""
    e = _scaled(spark, sf_dir)
    copies = e.select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        F.expr("transform(se, v -> v + (v % 97))").alias("se"),
    )
    return e.unionAll(copies)


#: banding for the cosine-dedup SELF-join: WIDE bands (16 sign bits each), not
#: the ANN probe banding (2 bits) — a self-join on a c-bit code collides
#: ~N^2 * bands / 2^c random pairs, so c must grow ~log2(N) for the candidate
#: set to stay near-linear (here 2^16 code space vs N~10^3 test vectors, and
#: the production rule is planes_per_band ≈ log2(N) + margin).  Near-dup
#: pairs (cosine ≈ 1) agree on ~99.6% of sign bits, so a 16-bit band still
#: matches with p ≈ 0.93 and 8 bands miss with p ≈ 6e-10.
COSDUP_PLANES = 128
COSDUP_BANDS = 8


def _band_codes_df(e: DataFrame, planes: int, bands: int, dim: int | None = None) -> DataFrame:
    """(vec_id, band, code): hyperplane band codes via ONE posexplode pass
    over each vector + a broadcast (plane, dim) weights join + two grouped
    integer aggregations — all whole-stage codegen.  Equivalent to (and
    hash-compatible with) the `_lsh_band_codes_expr` expression form, which
    evaluates `planes` interpreted aggregate-lambdas per row and only stays
    cheap for small plane counts; this is the shape that scales to the wide
    bands the cosine-dedup self-join needs.

    ``dim`` is a plan-time constant (array columns carry no length in the
    schema); callers pass it (EMB_DIM for the test tables) so building the
    query triggers NO Spark action — the old ``.first()`` fallback remains
    for ad-hoc use.  A plan-side guard raises at execution if any vector's
    length disagrees (a mismatched vector would otherwise silently drop or
    zero dimensions)."""
    spark = e.sparkSession
    if dim is None:
        dim = len(e.select("se").first()["se"])
    e = e.withColumn(
        "se",
        F.when(F.size("se") == dim, F.col("se")).otherwise(
            F.expr(f"array(CAST(raise_error(concat('embedding dim != {dim}: ', "
                   f"CAST(size(se) AS STRING))) AS BIGINT))")
        ),
    )
    r = planes // bands
    weights = (
        spark.range(planes * dim)
        .select(
            (F.col("id") / dim).cast("int").alias("plane"),
            F.pmod(F.col("id"), F.lit(dim)).cast("int").alias("j"),
        )
        .select(
            "plane",
            "j",
            # same +-1 family as the expression form: xxhash64 over INT
            # (plane, dim) pairs — parity verified by the planted-pair gate
            F.when(F.pmod(F.xxhash64(F.col("plane"), F.col("j")), F.lit(2)) == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("w"),
        )
    )
    ve = e.select("vec_id", F.posexplode("se").alias("j", "x"))
    dots = (
        ve.join(F.broadcast(weights), "j")
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    contrib = F.expr("CASE WHEN dot > 0 THEN shiftleft(1, int(pmod(plane, " + str(r) + "))) ELSE 0 END")
    return (
        dots.select("vec_id", (F.col("plane") / r).cast("int").alias("band"), contrib.alias("c"))
        .groupBy("vec_id", "band")
        .agg(F.sum("c").cast("int").alias("code"))
    )


def _band_codes_blas(e: DataFrame, planes: int, bands: int, dim: int) -> DataFrame:
    """Bit-identical matmul twin of :func:`_band_codes_df` as ONE mapInPandas
    stage (the `_ivf_rank_blas` shape): the +-1 hyperplane matrix — the SAME
    xxhash64-parity family, computed once in the JVM and collected as a
    (planes x dim) tiny frame — is closure-captured; each Arrow batch of
    vectors does a single integer matmul against it and assembles the band
    codes from the sign bits.

    Versus the Catalyst form this removes the per-vector dim-explode, the
    x{planes} broadcast-join fan-out (N x dim x planes intermediate rows)
    and two grouped aggregations — at the gate corpus the band-code frame
    drops ~0.6s -> ~0.15s, and at scale the vectors cross once over Arrow
    instead of fanning out 128x before a shuffle (guide §4.2).

    Bit-equality (pytest-asserted against the Catalyst twin): dots are
    exact int64 in both engines; code = sum over the band's planes of
    1 << (plane mod r) for dot > 0 — integer arithmetic only.  The ragged-
    vector guard keeps the fail-loudly contract: any vector whose length
    differs from ``dim`` raises instead of silently zero-padding."""
    import numpy as np

    spark = e.sparkSession
    r = planes // bands
    if planes != bands * r:
        raise ValueError(f"_band_codes_blas: planes={planes} not divisible by bands={bands}")
    wrows = (
        spark.range(planes * dim)
        .select(
            (F.col("id") / dim).cast("int").alias("plane"),
            F.pmod(F.col("id"), F.lit(dim)).cast("int").alias("j"),
        )
        .select(
            "plane",
            "j",
            F.when(F.pmod(F.xxhash64(F.col("plane"), F.col("j")), F.lit(2)) == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("w"),
        )
        .collect()
    )
    W = np.zeros((planes, dim), dtype=np.int64)
    for row in wrows:
        W[row["plane"], row["j"]] = row["w"]
    band_ids = np.arange(bands, dtype=np.int32)

    def code_batches(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            lens = pdf["se"].map(len).to_numpy()
            if (lens != dim).any():
                bad = int(lens[lens != dim][0])
                raise ValueError(f"embedding dim != {dim}: {bad}")
            V = _batch_matrix(pdf)
            bits = (V @ W.T) > 0  # (n, planes)
            vals = bits.astype(np.int64) << (np.arange(planes, dtype=np.int64) % r)[None, :]
            codes = vals.reshape(n, bands, r).sum(axis=2).astype(np.int32)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), bands),
                    "band": np.tile(band_ids, n),
                    "code": codes.ravel(),
                }
            )

    return e.select("vec_id", "se").mapInPandas(
        code_batches, "vec_id long, band int, code int"
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection: pairs with cosine >= 0.9.

    Scale shape: candidates come from banded random-hyperplane codes with
    WIDE bands sized for a self-join (see COSDUP_PLANES note — near-identical
    vectors agree on almost every sign bit, so every near-dup pair shares
    >= 1 of the 8 sixteen-bit bands with overwhelming probability, while
    random near-orthogonal pairs collide at ~2^-16 per band); ONLY candidates
    get the exact verification.  The cosine test is done in
    integer/fixed-point arithmetic lifted to one double compare —
    dot^2 >= tau^2 * |a|^2 * |b|^2 with identical IEEE op order in Spark and
    DuckDB — so the exhaustive-scan oracle matches bit-for-bit.  No
    theta-join anywhere (plan asserted in tests)."""
    e = _aug_embeddings(spark, sf_dir)
    bands = _band_codes_blas(e, COSDUP_PLANES, COSDUP_BANDS, dim=EMB_DIM)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "code"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )
    norms = e.select("vec_id", F.expr("aggregate(se, 0L, (a, v) -> a + v * v)").alias("n2"))
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("se").alias("sa"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("se").alias("sb"))
    dots = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        # positional explode instead of arrays_zip: zipping materializes a
        # dim-element struct array per candidate pair before the Generate;
        # exploding the constant index sequence and subscripting costs one
        # shared int array (same integer sum, same rows)
        .select(
            "vec_a", "vec_b", "sa", "sb",
            F.explode(F.expr(f"sequence(0, {EMB_DIM - 1})")).alias("__j"),
        )
        .groupBy("vec_a", "vec_b")
        .agg(F.sum(F.expr("sa[__j] * sb[__j]")).alias("dot"))
    )
    tau2 = repr(COSDUP_TAU * COSDUP_TAU)
    return (
        dots.join(norms.select(F.col("vec_id").alias("vec_a"), F.col("n2").alias("na2")), "vec_a")
        .join(norms.select(F.col("vec_id").alias("vec_b"), F.col("n2").alias("nb2")), "vec_b")
        .filter(
            (F.col("dot") > 0)
            & (
                F.col("dot").cast("double") * F.col("dot").cast("double")
                >= F.expr(f"{tau2} * CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)")
            )
        )
        .select("vec_a", "vec_b", "dot")
    )


_AUG_EMB_SQL = f"""
    SELECT vec_id, {_SCALE_SQL} AS se FROM embeddings
    UNION ALL
    SELECT vec_id + {PLANT_OFFSET} AS vec_id, [v + (v % 97) FOR v IN se] AS se
    FROM (SELECT vec_id, {_SCALE_SQL} AS se FROM embeddings)
"""

Q_DEDUP_EMB_COSINE_SQL = f"""
WITH e AS ({_AUG_EMB_SQL}),
pairs AS (
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           CAST((SELECT sum(a * b) FROM (SELECT unnest(x.se) AS a, unnest(y.se) AS b)) AS BIGINT) AS dot,
           CAST((SELECT sum(a * a) FROM (SELECT unnest(x.se) AS a)) AS BIGINT) AS na2,
           CAST((SELECT sum(b * b) FROM (SELECT unnest(y.se) AS b)) AS BIGINT) AS nb2
    FROM e x JOIN e y ON x.vec_id < y.vec_id
)
SELECT vec_a, vec_b, dot FROM pairs
WHERE dot > 0
  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)
      >= {COSDUP_TAU * COSDUP_TAU!r} * CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)
"""




def q_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k neighbors by dot product for the first N_PROBES
    vectors, in fixed point (floor(x*1e6+0.5) int64) so Spark and DuckDB
    agree exactly — the standard exact baseline an ANN index is judged
    against.

    Shape: the probe matrix (N_PROBES x dim ints) is closure-captured; one
    mapInPandas pass computes each batch's integer dots against it via
    matmul and keeps only the batch-local top-K per probe (the global
    top-K is a subset of the union of batch top-Ks), so the final window
    ranks at most #batches x N_PROBES x K rows — map-side top-K pruning,
    the same contract as a partial aggregate.  Dots are exact int64 and
    the tiebreak (dot desc, neighbor asc) is a total order, so the result
    is partitioning-invariant and bit-equal to the Catalyst explode-join
    twin (_ann_brute_catalyst, pytest-asserted) and to the DuckDB oracle."""
    e = _scaled(spark, sf_dir)
    pids, P = _collect_vectors(
        e.filter(F.col("vec_id") < N_PROBES), "probe set", "lower N_PROBES"
    )
    return _ann_brute_topk_from(e, pids, P)


def _ann_brute_topk_from(e: DataFrame, pids, P) -> DataFrame:
    """Body of :func:`q_ann_brute_topk` over an already-collected probe set
    — shared with `q_ann_ivf_recall`, whose recall comparison needs the
    same brute reference and already holds the probes on the driver (one
    scan+collect job fewer per IVF run)."""

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            V = _batch_matrix(pdf)
            D = V @ P.T  # exact int64, |dot| <= dim * (1e6)^2 << 2^63
            out_p, out_n, out_d = [], [], []
            for c, pid in enumerate(pids):
                keep = ids != pid
                # batch-local top-K by (dot desc, neighbor asc): lexsort's
                # primary key is its LAST key
                nb, dots = ids[keep], D[keep, c]
                sel = np.lexsort((nb, -dots))[:TOPK]
                out_p.append(np.full(len(sel), pid))
                out_n.append(nb[sel])
                out_d.append(dots[sel])
            yield pd.DataFrame(
                {
                    "probe_id": np.concatenate(out_p),
                    "neighbor_id": np.concatenate(out_n),
                    "dot": np.concatenate(out_d),
                }
            )

    cand = e.mapInPandas(local_topk, "probe_id long, neighbor_id long, dot long")
    w = Window.partitionBy("probe_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOPK)


def _ann_brute_catalyst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst twin of :func:`q_ann_brute_topk`: posexplode + broadcast
    equi-join on the dimension index + integer sum (whole-stage codegen,
    unlike zip_with/aggregate lambdas which run interpreted — measured 4x
    slower) — kept as the bit-equality witness for the matmul form."""
    e = _scaled(spark, sf_dir)
    probes = e.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.posexplode("se").alias("j", "y")
    )
    ee = e.select(F.col("vec_id").alias("neighbor_id"), F.posexplode("se").alias("j", "x"))
    dots = (
        ee.join(F.broadcast(probes), "j")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .groupBy("probe_id", "neighbor_id")
        .agg(F.sum(F.col("x") * F.col("y")).alias("dot"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return dots.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOPK)


Q_ANN_BRUTE_SQL = f"""
WITH e AS (SELECT vec_id, {_SCALE_SQL} AS se FROM embeddings),
probes AS (SELECT vec_id AS probe_id, se AS pe FROM e WHERE vec_id < {N_PROBES}),
dots AS (
    SELECT p.probe_id, e.vec_id AS neighbor_id,
           (SELECT sum(x * y) FROM (SELECT unnest(e.se) AS x, unnest(p.pe) AS y)) AS dot
    FROM e CROSS JOIN probes p
    WHERE e.vec_id != p.probe_id
)
SELECT probe_id, neighbor_id, CAST(dot AS BIGINT) AS dot,
       CAST(row_number() OVER (PARTITION BY probe_id ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
FROM dots
QUALIFY rank <= {TOPK}
"""

LSH_PLANES = 16
LSH_PLANE_BANDS = 8  # 8 bands x 2 planes: recall-leaning (measured 9-10/10
# per probe at sf0.01); production would use longer codes + multiprobe for
# selectivity — the gate here certifies recall, the knob is per-job


def _lsh_band_codes_expr(planes: int = LSH_PLANES, bands: int = LSH_PLANE_BANDS) -> str:
    """SQL expression (over a column ``se``) for the array of per-band
    hyperplane codes: sign bit of the dot against each +-1 hyperplane
    (weights from xxhash64(plane, dim) — deterministic), packed per band
    (``planes // bands`` sign bits per code)."""
    bits = []
    for p in range(planes):
        w = f"transform(sequence(0, size(se)-1), j -> CASE WHEN pmod(xxhash64({p}, j), 2) = 0 THEN 1 ELSE -1 END)"
        dot = f"aggregate(zip_with(se, {w}, (x, s) -> x * s), 0L, (acc, v) -> acc + v)"
        bits.append(f"(CASE WHEN {dot} > 0 THEN 1 ELSE 0 END)")
    r = planes // bands
    band_codes = [
        "(" + " + ".join(f"{bits[b * r + j]} * {1 << j}" for j in range(r)) + ")"
        for b in range(bands)
    ]
    return "array(" + ",".join(band_codes) + ")"


def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (random-hyperplane signatures, banded) with
    self-certified recall: for each probe, candidates = vectors sharing at
    least one 4-plane band; recall@10 against the exact brute-force top-10
    must be >= 0.5.  Hyperplane weights are +-1 from xxhash64(plane, dim) —
    deterministic, integer dot products.  Scale shape: signatures are one
    narrow projection; the candidate join is an equi-join on (band, code);
    only candidates get exact scoring."""
    e = _scaled(spark, sf_dir)
    sig = e.select("vec_id", "se", F.expr(_lsh_band_codes_expr()).alias("codes"))
    bands = sig.select("vec_id", "se", F.posexplode("codes").alias("band", "code"))

    probes = bands.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("se").alias("pe"), "band", "code"
    )
    cand = (
        bands.join(probes, ["band", "code"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "pe", F.col("vec_id").alias("neighbor_id"), "se")
        .distinct()
    )
    dots = cand.select(
        "probe_id",
        "neighbor_id",
        F.expr("aggregate(zip_with(se, pe, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").alias("dot"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    lsh_top = dots.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOPK)

    true_top = q_ann_brute_topk(spark, sf_dir).select("probe_id", "neighbor_id")
    overlap = lsh_top.join(true_top, ["probe_id", "neighbor_id"]).groupBy("probe_id").agg(
        F.count("*").alias("hits")
    )
    all_probes = _scaled(spark, sf_dir).filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id")
    )
    return all_probes.join(overlap, "probe_id", "left").select(
        "probe_id",
        (F.coalesce(F.col("hits"), F.lit(0)) >= int(TOPK * 0.5)).alias("recall_ok"),
    )


Q_ANN_LSH_SQL = f"""
SELECT CAST(vec_id AS BIGINT) AS probe_id, true AS recall_ok
FROM embeddings WHERE vec_id < {N_PROBES}
"""


IVF_SEED_MOD = 40  # every 40th vector seeds a coarse centroid (K = N/40)
IVF_NPROBE = 10
#: nprobe must track the LIST COUNT, not stay a constant: K grows with the
#: corpus (N/40), so a fixed nprobe probes a shrinking fraction of the
#: inverted lists and recall decays with scale — exactly how the sf0.1
#: sweep caught 2/5 probes under the floor (10 of 50 lists probed at
#: N=2000 vs 10 of 12 at the small fixtures).  The fraction here is HIGH
#: because the synthetic embeddings are near-uniform random — neighbors
#: scatter across lists, the worst case for IVF (measured at sf0.1:
#: 20% probed -> recall ~0.5, 80% -> >= 0.8).  Real embedding corpora are
#: clustered and run at 1-10% probe fractions; the gate verifies the
#: MACHINERY (train/assign/probe/exact-rescore) and its self-certified
#: floor, not the data's clusterability.
IVF_NPROBE_FRAC = 0.8
IVF_RECALL_FLOOR = 0.6
IVF_LLOYD_ITERS = 2


def _ivf_nprobe(k_lists: int) -> int:
    """max(IVF_NPROBE, ceil(IVF_NPROBE_FRAC * K)), capped at K."""
    import math

    return min(k_lists, max(IVF_NPROBE, math.ceil(IVF_NPROBE_FRAC * k_lists)))


def _dots_against(vectors: DataFrame, refs: DataFrame, ref_id: str) -> DataFrame:
    """Integer dot products of every vector against a small broadcast
    reference set (posexplode + join + sum — codegen; see q_ann_brute_topk)."""
    ve = vectors.select("vec_id", F.posexplode("se").alias("j", "x"))
    re_ = refs.select(F.col(ref_id), F.posexplode("ce").alias("j", "y"))
    return (
        ve.join(F.broadcast(re_), "j")
        .groupBy("vec_id", ref_id)
        .agg(F.sum(F.col("x") * F.col("y")).alias("dot"))
    )


def _ivf_rank(vectors: DataFrame, cents: DataFrame, n: int) -> DataFrame:
    """(vec_id, cid, rn): rank of each centroid per vector by spherical
    score dot/|c| (cosine up to the constant |v|), rows with rn <= n kept.
    Deterministic tiebreak on cid."""
    norms = cents.select(
        "cid",
        F.expr("sqrt(aggregate(ce, 0.0D, (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))").alias("cn"),
    )
    w_vec = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("cid"))
    return (
        _dots_against(vectors, cents, "cid")
        .join(F.broadcast(norms), "cid")
        .withColumn("score", F.col("dot").cast("double") / F.col("cn"))
        .withColumn("rn", F.row_number().over(w_vec))
        .filter(F.col("rn") <= n)
        .select("vec_id", "cid", "rn")
    )


def _ivf_rank_blas(vectors: DataFrame, cents: DataFrame, n: int) -> DataFrame:
    """Bit-identical twin of :func:`_ivf_rank` as ONE mapInPandas stage: the
    quantizer (K x dim ints — small by construction, it IS the broadcast
    side) is captured in the closure; each Arrow batch of vectors does a
    single integer matmul against it and emits its top-n centroids.

    This is the 100 TB shape for quantizer assignment: the Catalyst form
    explodes N x dim x K join rows per pass, the matmul form ships each
    vector over Arrow once and does dim*K multiply-adds in C — for K >= 50
    that is the difference between a shuffle-sized intermediate and none.
    Bit-equality (pytest-asserted vs the Catalyst twin): dots are exact
    int64 in both; |c|^2 < 2^53 makes the JVM's sequential double fold of
    squares exact and equal to numpy's int64 sum; score = double division
    of identical operands; argsort(-scores, stable) ties resolve to the
    lowest cid exactly like the window's (desc score, asc cid)."""
    cids, C, cn = _quantizer_arrays(cents, "_ivf_rank_blas")
    k = min(n, len(cids))

    def rank_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = _batch_matrix(pdf)
            idx = _topk_centroids(V, C, cn, k)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), k),
                    "cid": cids[idx].ravel().astype(np.int32),
                    "rn": np.tile(np.arange(1, k + 1, dtype=np.int32), len(pdf)),
                }
            )

    return vectors.select("vec_id", "se").mapInPandas(
        rank_batches, "vec_id long, cid int, rn int"
    )


def _quantizer_arrays(cents: DataFrame, where: str):
    """Collect + validate the (tiny by contract) quantizer once: ascending
    cid array, K x dim int64 centroid matrix, double norms.  Shared by the
    mapInPandas ranker and the driver-side probe ranking so the two paths
    cannot drift."""
    crows = sorted(cents.collect(), key=lambda r: r["cid"])
    if len(crows) > IVF_LOCAL_SEED_CAP:
        raise ValueError(
            f"{where}: quantizer has {len(crows)} centroids > "
            f"IVF_LOCAL_SEED_CAP={IVF_LOCAL_SEED_CAP}; too large to "
            "closure-capture per batch — use the Catalyst _ivf_rank"
        )
    cids = np.array([r["cid"] for r in crows], dtype=np.int64)
    C = np.array([r["ce"] for r in crows], dtype=np.int64)
    sq = (C * C).sum(axis=1, dtype=np.int64)
    _require_nonzero_norms(sq, where)
    return cids, C, np.sqrt(sq.astype(np.float64))


def _topk_centroids(V, C, cn, k):
    """Row-wise top-k centroid indices by double(dot)/|c|, stable argsort so
    score ties resolve to the lowest cid (cids ascending) — the exact op
    sequence the bit-equality argument in _ivf_rank_blas relies on."""
    scores = (V @ C.T).astype(np.float64) / cn[None, :]
    return np.argsort(-scores, axis=1, kind="stable")[:, :k]


#: largest training sample the LOCAL Lloyd trainer will collect (vectors;
#: at dim 64 x int64 that is ~512 MB of driver memory) — past it, raise
#: sample_mod or pass distributed=True
IVF_LOCAL_TRAIN_CAP = 1_000_000
#: largest seed/centroid set the local paths will hold (bounds K, and with
#: it every per-batch V @ C.T in _ivf_rank_blas) — past it, raise
#: IVF_SEED_MOD or pass distributed=True
IVF_LOCAL_SEED_CAP = 65_536
#: element cap on the local trainer's T x K score matrix (float64: 2^28
#: elements = 2 GiB) — the row caps alone don't bound the PRODUCT, and the
#: score matrix is the trainer's real memory term
IVF_LOCAL_SCORE_ELEMS = 1 << 28


def _require_nonzero_norms(sq, where: str) -> None:
    """A zero-norm centroid must fail loudly: numpy scores it dot/0 = inf
    (ranks FIRST under argsort(-scores)) while Spark's double division
    yields NULL (ranks LAST under desc) — the one input on which the
    'bit-identical twins' contract silently breaks, so neither engine is
    allowed to proceed past it."""
    if (sq == 0).any():
        raise ValueError(f"{where}: zero-norm centroid (all-zero vector)")


def _batch_matrix(pdf, col: str = "se"):
    """Arrow batch list-column -> dense int64 matrix (one row per record)."""
    import numpy as np

    return np.array(list(pdf[col].to_numpy()), dtype=np.int64)


def _ivf_train(
    spark: SparkSession,
    e: DataFrame,
    iters: int = IVF_LLOYD_ITERS,
    sample_mod: int = 1,
    distributed: bool = False,
) -> DataFrame:
    """Deterministic seeded k-means (spherical Lloyd) over the scaled
    integer vectors: seeds = every IVF_SEED_MOD-th vector; per iteration
    assign each training vector to its argmax-dot/|c| centroid, recompute
    centroids as the per-dimension integer-rounded mean, keep the old
    centroid for empty clusters.

    Two bit-identical engines (equality pytest-asserted):

    * **local (default)** — collect the (sampled) training set once and run
      the Lloyd passes in numpy on the driver.  This is the production
      quantizer-training shape (FAISS, ScaNN: train k-means on a bounded
      in-memory sample, never distributed): the sample is capped at
      IVF_LOCAL_TRAIN_CAP vectors, the seed set at IVF_LOCAL_SEED_CAP
      (bounding K), and the T x K score matrix — the real memory term,
      which the row caps alone do not bound — at IVF_LOCAL_SCORE_ELEMS
      elements, every collect LIMIT-guarded, so the driver cost is
      enforced-bounded no matter the corpus size.  At the gate scale
      this removes ~4 s of per-iteration Spark job scheduling that
      dominated the whole IVF line.
    * **distributed** (``distributed=True``) — the original DataFrame-only
      Lloyd (broadcast join + window argmax per pass, K*dim ints back to
      the driver per iteration, MLlib-shaped), for when even the training
      sample exceeds driver memory.

    Bit-equality argument: dots and per-cluster sums are exact int64 in
    both engines; |c|^2 <= dim * (10^6)^2 < 2^53 so every partial sum in
    the JVM's sequential double fold is an exactly-representable integer
    (== numpy's int64 sum cast to double); score = double(dot)/double(|c|)
    and mean = double(sum)/double(count) are then single IEEE ops with
    identical operands, and floor(avg + 0.5) follows.  Ties in the argmax
    resolve to the lowest cid in both.

    ``sample_mod`` > 1 runs the Lloyd passes over the deterministic
    every-``sample_mod``-th subset — the documented production shape at
    corpus scale (a quantizer trained on ~10^5-10^6 sampled vectors is
    standard; Lloyd passes over all of 100 TB would dominate the whole job).
    Seeds still come from the FULL vector set so K and the centroid ids are
    unchanged by sampling — but sampled Lloyd means are computed over the
    subset, so centroid COORDINATES (and hence inverted-list assignment)
    can shift slightly; callers relying on recall must keep gating it (the
    bench's sampled line asserts the recall floor itself)."""
    if not distributed:
        return _ivf_train_local(spark, e, iters, sample_mod)
    return _ivf_train_distributed(spark, e, iters, sample_mod)


def _collect_vectors(df: DataFrame, what: str, remedy: str, cap: int | None = None):
    """LIMIT-guarded collect of (vec_id, se) into numpy (ids ascending,
    int64 matrix in the same order); raises with a remedy that actually
    applies to the overflowing set, before the driver can be flooded.
    ``cap`` defaults to IVF_LOCAL_TRAIN_CAP resolved at CALL time (a
    def-time default would freeze the module global and silently ignore
    test monkeypatching — the --df-cap bug class)."""
    import numpy as np

    if cap is None:
        cap = IVF_LOCAL_TRAIN_CAP
    rows = df.select("vec_id", "se").limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(f"IVF local path: {what} exceeds {cap} vectors; {remedy}")
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["se"] for r in rows], dtype=np.int64)
    return ids, mat


def _ivf_train_local(
    spark: SparkSession, e: DataFrame, iters: int, sample_mod: int
) -> DataFrame:
    import numpy as np

    train = e if sample_mod <= 1 else e.filter(F.col("vec_id") % sample_mod == 0)
    train_ids, T = _collect_vectors(
        train, "training sample", "raise sample_mod or pass distributed=True"
    )
    # sample_mod does NOT filter the seed set — its remedy is the seed stride.
    # When the seed stride is a multiple of the sample stride the seeds are a
    # SUBSET of the already-collected training sample (vec_id % 40 == 0 ⟹
    # vec_id % 4 == 0), so they are sliced locally instead of paying a second
    # scan+collect job — bit-identical rows either way (both collects sort by
    # vec_id), cap semantics preserved by the explicit length check
    if sample_mod <= 1 or IVF_SEED_MOD % sample_mod == 0:
        mask = train_ids % IVF_SEED_MOD == 0
        seed_ids = train_ids[mask]
        if len(seed_ids) > IVF_LOCAL_SEED_CAP:
            raise ValueError(
                f"IVF local path: seed set exceeds {IVF_LOCAL_SEED_CAP} vectors; "
                "raise IVF_SEED_MOD (sample_mod does not filter seeds) or pass "
                "distributed=True"
            )
        C = T[mask].copy()
    else:
        seed_ids, C = _collect_vectors(
            e.filter(F.col("vec_id") % IVF_SEED_MOD == 0),
            "seed set",
            "raise IVF_SEED_MOD (sample_mod does not filter seeds) or pass distributed=True",
            cap=IVF_LOCAL_SEED_CAP,
        )
    if len(T) * len(seed_ids) > IVF_LOCAL_SCORE_ELEMS:
        raise ValueError(
            f"IVF local trainer: score matrix {len(T)} x {len(seed_ids)} exceeds "
            f"IVF_LOCAL_SCORE_ELEMS={IVF_LOCAL_SCORE_ELEMS} — the row caps bound "
            "each side but not the product; raise sample_mod / IVF_SEED_MOD or "
            "pass distributed=True"
        )
    cids = (seed_ids // IVF_SEED_MOD).astype(np.int64)  # ascending with seed_ids
    for _ in range(iters):
        # assignment: argmax double(dot)/|c|; np.argmax first-max == lowest
        # cid on ties (cids ascending) — same as the window's (desc score,
        # asc cid) row_number
        sq = (C * C).sum(axis=1, dtype=np.int64)
        _require_nonzero_norms(sq, "IVF local trainer")
        scores = (T @ C.T).astype(np.float64) / np.sqrt(sq.astype(np.float64))[None, :]
        assign = np.argmax(scores, axis=1)
        # one vectorized pass (np.add.at int64 sums == the per-cluster int64
        # sums: exact integer arithmetic, order-free), not a K x N mask scan
        sums = np.zeros_like(C)
        np.add.at(sums, assign, T)
        counts = np.bincount(assign, minlength=len(cids))
        nz = counts > 0  # empty clusters keep their old centroid
        avg = sums[nz].astype(np.float64) / counts[nz, None].astype(np.float64)
        C[nz] = np.floor(avg + 0.5).astype(np.int64)
    # VALUES LocalRelation, not createDataFrame: the centroid frame is
    # collected twice downstream (assignment closure + probe ranking), and a
    # pickled-RDD-backed frame pays a defaultParallelism-task Python job per
    # evaluation — LocalTableScan collects driver-side with no job at all
    # (hg64spark.localrel module docstring)
    return local_rows_df(
        spark,
        [(int(c), [int(x) for x in row]) for c, row in zip(cids, C)],
        "cid int, ce array<bigint>",
    )


def _ivf_train_distributed(
    spark: SparkSession, e: DataFrame, iters: int, sample_mod: int
) -> DataFrame:
    train = e if sample_mod <= 1 else e.filter(F.col("vec_id") % sample_mod == 0)
    cents = e.filter(F.col("vec_id") % IVF_SEED_MOD == 0).select(
        (F.col("vec_id") / IVF_SEED_MOD).cast("int").alias("cid"), F.col("se").alias("ce")
    )
    for _ in range(iters):
        assigned = _ivf_rank(train, cents, 1).select("vec_id", "cid")
        means = (
            assigned.join(train, "vec_id")
            .select("cid", F.posexplode("se").alias("j", "x"))
            .groupBy("cid", "j")
            .agg(F.floor(F.avg("x") + F.lit(0.5)).cast("long").alias("m"))
            .groupBy("cid")
            .agg(F.expr("transform(array_sort(collect_list(struct(j, m))), s -> s.m)").alias("ce"))
        )
        updated = (
            cents.select("cid", F.col("ce").alias("old"))
            .join(means, "cid", "left")
            .select("cid", F.coalesce("ce", "old").alias("ce"))
        )
        cents = local_rows_df(
            spark, [(r["cid"], list(r["ce"])) for r in updated.collect()], "cid int, ce array<bigint>"
        )
    return cents


def q_ann_ivf_recall(spark: SparkSession, sf_dir: str, sample_mod: int = 4) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: deterministic seeded k-means
    (spherical Lloyd, DataFrame-only — see _ivf_train), inverted lists =
    argmax-centroid assignment, probes search the nprobe nearest lists,
    candidates get exact scoring.  Gate: recall@10 >= 0.6 per probe vs brute
    force (self-certified; measured min 0.8-0.9 at the gated scales, up from
    the 0.3 floor of the untrained every-20th-vector quantizer).

    Scale shape: training runs in numpy on a capped collected sample (the
    FAISS shape — see _ivf_train; the DataFrame-only Lloyd remains behind
    distributed=True); assignment and probe ranking are one mapInPandas
    matmul each against the closure-captured quantizer (_ivf_rank_blas,
    bit-equal to the Catalyst window form); probing then touches only the
    selected inverted lists (an equi-join on centroid id).  ``sample_mod``
    > 1 trains the quantizer on the every-``sample_mod``-th subset;
    the DEFAULT is sampled training (mod 4) so the driver gate and the
    bench line both exercise the shape you'd run at corpus scale — the gate
    still self-certifies the recall floor, which is what makes sampled
    centroids safe to gate.  Pass sample_mod=1 for the full train."""
    e = _scaled(spark, sf_dir)
    cents = _ivf_train(spark, e, sample_mod=sample_mod)
    assigned = _ivf_rank_blas(e, cents, 1).select("vec_id", "cid")
    # Probe-side work is driver-local: there are N_PROBES (a small constant)
    # probe vectors and the quantizer is driver-resident by contract, so
    # ranking the probes' nprobe nearest lists is N_PROBES x K numpy work —
    # the old second mapInPandas pass shipped a handful of rows through a
    # whole Spark stage, and cents.count() was a third action on the local
    # relation.  Same _collect_vectors ordering, same ranking kernel
    # (_topk_centroids) as the distributed assignment — bit-identical rows.
    pids, P = _collect_vectors(
        e.filter(F.col("vec_id") < N_PROBES), "probe set", "lower N_PROBES"
    )
    cids, C, cn = _quantizer_arrays(cents, "q_ann_ivf_recall probe ranking")
    nprobe = _ivf_nprobe(len(cids))
    k = min(nprobe, len(cids))
    idx = _topk_centroids(P, C, cn, k) if len(pids) else np.empty((0, 0), dtype=np.int64)
    plists = local_rows_df(
        spark,
        [(int(p), int(c)) for p, row in zip(pids, idx) for c in cids[row]],
        "probe_id long, cid int",
    )
    cand = (
        plists.join(assigned, "cid")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    # exact scoring of the CANDIDATES ONLY (the point of the inverted lists):
    # attach both vectors to each candidate pair, positional explode, integer
    # sum — never the full N x P cross like the brute-force baseline.  The
    # probe vectors are already on the driver; the broadcast side is built
    # from them as a local relation instead of a third scan of the table.
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("se").alias("nv"))
    pv = local_rows_df(
        spark,
        [(int(p), [int(x) for x in row]) for p, row in zip(pids, P)],
        "probe_id long, pv array<bigint>",
    )
    scored = (
        cand.join(ne, "neighbor_id")
        .join(F.broadcast(pv), "probe_id")
        # positional explode instead of arrays_zip (see q_dedup_embedding_cosine)
        .select(
            "probe_id", "neighbor_id", "nv", "pv",
            F.explode(F.expr(f"sequence(0, {EMB_DIM - 1})")).alias("__j"),
        )
        .groupBy("probe_id", "neighbor_id")
        .agg(F.sum(F.expr("nv[__j] * pv[__j]")).alias("dot"))
    )
    w_p = Window.partitionBy("probe_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    ivf_top = scored.withColumn("rk", F.row_number().over(w_p)).filter(F.col("rk") <= TOPK)
    # brute reference from the SAME collected probe set (one collect fewer)
    true_top = _ann_brute_topk_from(e, pids, P).select("probe_id", "neighbor_id")
    overlap = ivf_top.join(true_top, ["probe_id", "neighbor_id"]).groupBy("probe_id").agg(
        F.count("*").alias("hits")
    )
    # the collected probe ids ARE e.filter(vec_id < N_PROBES)'s id column
    # (same filter, _collect_vectors sorts ascending) — local relation, no
    # fourth scan of the table
    all_probes = local_rows_df(spark, [(int(p),) for p in pids], "probe_id long")
    return all_probes.join(overlap, "probe_id", "left").select(
        "probe_id",
        (F.coalesce(F.col("hits"), F.lit(0)) >= int(TOPK * IVF_RECALL_FLOOR)).alias("recall_ok"),
    )


Q_ANN_IVF_SQL = f"""
SELECT CAST(vec_id AS BIGINT) AS probe_id, true AS recall_ok
FROM embeddings WHERE vec_id < {N_PROBES}
"""


# ------------------------------------------------------------- multimodal


def q_multimodal_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload plumbing gate: documents re-emitted as opaque byte
    payloads (the multimodal item shape), with byte length and content md5 —
    properties the oracle can recompute exactly (DuckDB md5(text) hashes the
    same UTF-8 bytes Spark's md5(encode(text)) does).  The feature-extraction
    pandas-UDF stage over the same payloads is covered by
    tests/test_dataops.py (feature values are library-internal, not
    SQL-reproducible)."""
    from hg64spark.multimodal import items_from_documents

    items = items_from_documents(_docs(spark, sf_dir))
    return items.select(
        "item_id",
        "modality",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


Q_MULTIMODAL_SQL = """
SELECT doc_id AS item_id, 'text' AS modality,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


def q_multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-codec round-trip gate: per item, synthesize a closed-form
    RGB image (multimodal.synth_image), encode it to genuine binary PPM
    bytes, ship the opaque binary column through Spark, decode with the
    dependency-free P6 parser, and emit integer stats (width, height, exact
    pixel sum).  The oracle predicts those stats straight from item_id —
    any bug in either codec direction, the binary plumbing, or the Arrow
    batch shape breaks the value hash.  This closes the 'decoders are
    honest stubs' gap: PPM decode is a real parser (comments, whitespace
    grammar, truncation checks), not a fake."""
    from hg64spark.multimodal import image_stats, synth_items

    return image_stats(synth_items(_docs(spark, sf_dir), "image"))


# closed-form stat prediction; DuckDB's correlated fan-out idiom is a list
# comprehension over range(n) (generate_series rejects lateral column args)
Q_MM_IMAGE_SQL = """
SELECT doc_id AS item_id,
       CAST(doc_id % 5 + 2 AS BIGINT) AS width,
       CAST(doc_id % 3 + 2 AS BIGINT) AS height,
       CAST(list_sum([(doc_id * 31 + i) % 256
                      FOR i IN range((doc_id % 5 + 2) * (doc_id % 3 + 2) * 3)])
            AS BIGINT) AS px_sum
FROM documents WHERE doc_id IS NOT NULL
"""


def q_multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-codec round-trip gate: synthesize a closed-form int16
    waveform per item, encode to genuine RIFF/WAVE PCM bytes, decode with
    the dependency-free chunk-walking parser, emit (sample_rate, n_samples,
    exact |amplitude| sum); oracle predicts all three from item_id."""
    from hg64spark.multimodal import audio_stats, synth_items

    return audio_stats(synth_items(_docs(spark, sf_dir), "audio"))


Q_MM_AUDIO_SQL = """
SELECT doc_id AS item_id,
       CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
       CAST(doc_id % 50 + 10 AS BIGINT) AS n_samples,
       CAST(list_sum([abs((doc_id * 7 + i * 13) % 2048 - 1024)
                      FOR i IN range(doc_id % 50 + 10)])
            AS BIGINT) AS amp_sum
FROM documents WHERE doc_id IS NOT NULL
"""


# ------------------------------------------------------------- registration

def q_text_selfrepeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-repetition scoring — the standard quality filter for looped /
    boilerplate generations: per document, the maximum multiplicity of any
    word 5-gram within that document, plus the repeated-mass ratio
    (occurrences of non-unique shingles / total shingles).  Pure integer
    arithmetic, exact in both engines.  Scale shape: one groupBy on
    (doc_id, shingle) + one per-doc aggregation — no self-join, no window."""
    s = raw_shingles(_docs(spark, sf_dir).select("doc_id", "text"))
    mult = s.groupBy("doc_id", "sh").agg(F.count("*").alias("m"))
    return mult.groupBy("doc_id").agg(
        F.max("m").cast("long").alias("max_mult"),
        F.sum(F.when(F.col("m") > 1, F.col("m")).otherwise(F.lit(0))).cast("long").alias("repeated"),
        F.sum("m").cast("long").alias("total"),
    ).select(
        "doc_id",
        "max_mult",
        (F.col("repeated").cast("double") / F.col("total").cast("double")).alias("repeat_ratio"),
        (F.col("max_mult") >= 3).alias("is_repetitive"),
    )


def _text_selfrepeat_sql() -> str:
    raw = _raw_shingles_sql("SELECT doc_id, text FROM documents")
    return f"""
    WITH mult AS (SELECT doc_id, sh, count(*) AS m FROM ({raw}) GROUP BY 1, 2)
    SELECT doc_id,
           CAST(max(m) AS BIGINT) AS max_mult,
           CAST(sum(CASE WHEN m > 1 THEN m ELSE 0 END) AS DOUBLE)
               / CAST(sum(m) AS DOUBLE) AS repeat_ratio,
           max(m) >= 3 AS is_repetitive
    FROM mult GROUP BY doc_id
    """


#: probe set for the decontamination gate: the first N documents play the
#: role of a held-out benchmark whose content must not leak into training
DECON_PROBE_DOCS = 5


def q_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    5-gram with a (small) probe set — here the first DECON_PROBE_DOCS
    documents standing in for a held-out eval set.  The probe shingle set is
    broadcast (eval sets are tiny by definition) and the RAW corpus shingle
    stream is pruned against it FIRST — only the (tiny) surviving hits get
    the per-doc distinct + count, so no full corpus-shingle shuffle ever
    happens (a distinct-before-prune would Exchange every corpus shingle).
    Runs over the AUGMENTED corpus so the planted near-duplicates of the
    probe docs are guaranteed contamination the gate must find (the
    realistic leak shape: eval content paraphrased/truncated into training
    data), alongside any natural overlap.  Output: every contaminated doc
    with its distinct overlapping-shingle count (probe docs themselves
    excluded)."""
    c = augmented_corpus(spark, sf_dir)
    probe_sh = shingles(c.filter(F.col("doc_id") < DECON_PROBE_DOCS)).select("sh").distinct()
    corpus_sh = raw_shingles(c.filter(F.col("doc_id") >= DECON_PROBE_DOCS))
    hits = corpus_sh.join(F.broadcast(probe_sh), "sh").select("doc_id", "sh").distinct()
    return hits.groupBy("doc_id").agg(F.count("*").alias("n_overlap"))


def _decontaminate_sql() -> str:
    return f"""
    WITH sh AS ({_shingles_sql(AUGMENTED_SQL)}),
    probe AS (SELECT DISTINCT sh FROM sh WHERE doc_id < {DECON_PROBE_DOCS})
    SELECT s.doc_id, count(*) AS n_overlap
    FROM sh s JOIN probe p ON p.sh = s.sh
    WHERE s.doc_id >= {DECON_PROBE_DOCS}
    GROUP BY s.doc_id
    """


#: sizing hint for the decontamination Bloom — at production this comes from
#: table statistics or a prior HLL estimate of the eval set's shingle count,
#: NOT from counting the probe set (sizing must not cost an extra action).
#: Oversizing only wastes filter bits; undersizing only raises the FP rate
#: the exact verify join absorbs — correctness never depends on the hint.
DECON_BLOOM_CAPACITY_HINT = 4096


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned decontamination — the shape for eval sets too large to
    broadcast raw: a Bloom of the probe shingles (a 10M-shingle eval set is
    ~20 MB of filter words at 1% fpp vs ~500 MB of raw strings) prunes the
    RAW corpus shingle stream, then the exact verify join + per-doc
    distinct runs on the SURVIVORS only.  No false negatives (Bloom
    guarantee -> no missed contamination); false positives die in the
    verify.  Result — and oracle — identical to the exact-broadcast
    operator.

    Fully distributed, ONE Catalyst plan, zero driver actions: the filter
    is built relationally (``bloom_words_relational`` — per-partition
    partial BIT_ORs map-side-combined, the shuffle reduce IS the OR-merge)
    and the prune is ``bloom_prune_relational``'s conjunction of broadcast
    joins against the words table, so the corpus stream is never Exchanged
    before the (tiny) survivor stage.  Sized from a capacity HINT
    (`DECON_BLOOM_CAPACITY_HINT`) rather than a count action; a wrong hint
    moves only the FP rate, never the result."""
    from hg64spark import relational
    from hg64spark.sketches import Bloom

    c = augmented_corpus(spark, sf_dir)
    probe_sh = shingles(c.filter(F.col("doc_id") < DECON_PROBE_DOCS)).select("sh").distinct()
    n_bits, n_hashes = Bloom.params_for_capacity(DECON_BLOOM_CAPACITY_HINT)
    words = relational.bloom_words_relational(probe_sh, "sh", n_bits, n_hashes)
    corpus_sh = raw_shingles(c.filter(F.col("doc_id") >= DECON_PROBE_DOCS))
    survivors = relational.bloom_prune_relational(corpus_sh, "sh", words, n_bits, n_hashes)
    hits = survivors.join(F.broadcast(probe_sh), "sh").select("doc_id", "sh").distinct()
    return hits.groupBy("doc_id").agg(F.count("*").alias("n_overlap"))


#: near-dup decontamination threshold — same hashed-shingle Jaccard space
#: and threshold as the dedup operators, so "this training doc is a
#: near-copy of an eval doc" means exactly what "these two training docs
#: are near-copies" means
DECON_NEARDUP_TAU = NEARDUP_TAU


def q_decontaminate_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup benchmark decontamination: (doc_id, probe_id, jaccard) for
    every corpus doc whose hashed-shingle Jaccard with an eval-probe doc is
    >= DECON_NEARDUP_TAU.  Exact-overlap decontamination
    (`q_decontaminate_overlap`) misses the realistic leak shape — eval
    content lightly edited into training data shares most but not all
    shingles; this operator catches it with the SAME similarity definition
    the near-dup dedup family uses (60-bit hashed shingles, oracle-
    mirrored), over the augmented corpus whose planted truncated copies of
    the probe docs are guaranteed contamination the gate must find.

    Scale shape — exploits that eval sets are tiny by definition:
      1. probe shingle sets broadcast (as in the exact-overlap operator);
      2. candidate intersections from ONE broadcast join of the raw corpus
         shingle stream against the probe shingles — only probe-matching
         rows survive, so no corpus self-join, no df cap needed (skew is
         bounded by the probe set), and NO LSH recall risk: with a
         broadcastable probe side the exact intersection IS affordable,
         so this is lossless where banding would be probabilistic;
      3. corpus doc sizes (the Jaccard denominator) computed ONLY for docs
         with >= 1 hit — the corpus shingle stream is semi-join-pruned
         before its distinct, so the full corpus is never Exchanged
         (the prune-first discipline of the overlap operator).
    For probe sets too large to broadcast raw, compose the Bloom prune
    (`bloom_words_relational`) in front, or fall back to the banded
    `minhash_neardup_pairs` machinery."""
    corpus_sh, probe_sh = _decon_hashed_streams(spark, sf_dir)
    return _probe_jaccard_flags(corpus_sh, corpus_sh, probe_sh)


def _decon_hashed_streams(spark: SparkSession, sf_dir: str):
    """(corpus_sh, probe_sh): the hashed shingle streams both near-dup
    decontamination variants start from.  The probe stream hashes the RAW
    shingles, then ONE distinct over the hashed keys — a distinct on the
    raw strings first would be a second, wasted shuffle (hashing is
    injective enough that the post-hash distinct already defines the set,
    as in the oracle's keyed-shingles CTE)."""
    c = augmented_corpus(spark, sf_dir)
    probe_sh = (
        raw_shingles(c.filter(F.col("doc_id") < DECON_PROBE_DOCS))
        .select(F.col("doc_id").alias("probe_id"), _tokhash_spark(F.col("sh")).alias("hh"))
        .distinct()
    )
    corpus_sh = raw_shingles(c.filter(F.col("doc_id") >= DECON_PROBE_DOCS)).select(
        "doc_id", _tokhash_spark(F.col("sh")).alias("hh")
    )
    return corpus_sh, probe_sh


def _probe_jaccard_flags(
    corpus_sh: DataFrame, candidate_sh: DataFrame, probe_sh: DataFrame
) -> DataFrame:
    """Shared verification body of the two near-dup decontamination
    variants — ONE implementation so the 'identical answer, one oracle
    serves both' contract cannot drift.  ``candidate_sh`` is the stream
    the intersection runs on (the full corpus stream, or its Bloom-pruned
    survivors — pruning cannot change the intersection by the no-false-
    negative guarantee); ``corpus_sh`` is always the full stream, because
    the Jaccard denominator must count every distinct shingle of the hit
    docs."""
    inter = (
        candidate_sh.join(F.broadcast(probe_sh), "hh")
        .select("doc_id", "probe_id", "hh")
        .distinct()
        .groupBy("doc_id", "probe_id")
        .agg(F.count("*").alias("c"))
    )
    hitdocs = inter.select("doc_id").distinct()
    na = (
        corpus_sh.join(F.broadcast(hitdocs), "doc_id", "left_semi")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("na"))
    )
    nb = probe_sh.groupBy("probe_id").agg(F.count("*").alias("nb"))
    jac = (
        F.col("c").cast("double")
        / (F.col("na") + F.col("nb") - F.col("c")).cast("double")
    )
    return (
        inter.join(na, "doc_id")
        .join(F.broadcast(nb), "probe_id")
        .select("doc_id", "probe_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= DECON_NEARDUP_TAU)
    )


def q_decontaminate_neardup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned near-dup decontamination — the composition the exact
    operator's docstring points at for probe sets too large to broadcast
    raw: a relationally-built Bloom of the probe shingle HASHES prunes the
    corpus shingle stream map-side (broadcast bit-test joins — the corpus
    is never Exchanged before the survivor stage), then the exact
    intersection + Jaccard runs on the survivors.  Identical answer to
    `q_decontaminate_neardup` by the Bloom no-false-negative guarantee
    (false positives die in the exact intersection; the Jaccard
    denominator still counts every distinct shingle of the hit docs from
    the un-pruned stream) — one oracle serves both, like the
    overlap/bloom pair."""
    from hg64spark import relational
    from hg64spark.sketches import Bloom

    corpus_sh, probe_sh = _decon_hashed_streams(spark, sf_dir)
    n_bits, n_hashes = Bloom.params_for_capacity(DECON_BLOOM_CAPACITY_HINT)
    words = relational.bloom_words_relational(probe_sh.select("hh"), "hh", n_bits, n_hashes)
    survivors = relational.bloom_prune_relational(corpus_sh, "hh", words, n_bits, n_hashes)
    return _probe_jaccard_flags(corpus_sh, survivors, probe_sh)


def _decontaminate_neardup_sql() -> str:
    ks = _keyed_shingles_sql(AUGMENTED_SQL, hashed=True)
    p = DECON_PROBE_DOCS
    jac = "CAST(i.c AS DOUBLE) / CAST(na.na + nb.nb - i.c AS DOUBLE)"
    return f"""
    WITH ks AS ({ks}),
    probe AS (SELECT doc_id AS probe_id, sh FROM ks WHERE doc_id < {p}),
    corp AS (SELECT doc_id, sh FROM ks WHERE doc_id >= {p}),
    na AS (SELECT doc_id, count(*) AS na FROM corp GROUP BY 1),
    nb AS (SELECT probe_id, count(*) AS nb FROM probe GROUP BY 1),
    inter AS (
        SELECT c.doc_id, p.probe_id, count(*) AS c
        FROM corp c JOIN probe p ON c.sh = p.sh GROUP BY 1, 2
    )
    SELECT i.doc_id, i.probe_id, {jac} AS jaccard
    FROM inter i
    JOIN na ON na.doc_id = i.doc_id
    JOIN nb ON nb.probe_id = i.probe_id
    WHERE {jac} >= {DECON_NEARDUP_TAU}
    """


# --------------------------------------------- chunking / fixed-K sampling

#: chunk geometry for the gate: 64-token windows advancing 32 tokens, so
#: typical documents produce several overlapping chunks
CHUNK_TOKENS = 64
CHUNK_STRIDE = 32


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_chunk_tokens): overlapping
    fixed-window sequence chunking — the context-window preparation step of
    a training pipeline (chunk i covers tokens [i*stride+1, i*stride+
    chunk_tokens], 1-based, clipped at the document end).  Emission stops
    at the FIRST chunk that reaches the document end: a later start would
    only produce a strict sub-window of its predecessor (adding no new
    context), which happens whenever chunk_tokens >= 2*stride.  With
    stride > chunk_tokens (gapped sampling) starts are additionally capped
    to lie inside the document.  Tail chunks may be short.  Pure Catalyst:
    one explode over the per-doc start sequence and HOF slice/join —
    per-row fan-out is <= ceil(n/stride), bounded by document length, with
    no shuffle at all (chunking is embarrassingly parallel; asserted
    zero-Exchange in tests)."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    c, s = int(chunk_tokens), int(stride)
    toks = F.split(F.col("text"), " ")
    d = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", toks.alias("l"), (F.size(toks) - 1).alias("nm1")
    )
    # last start index: first i whose window reaches the end — for n > c
    # that is ceil((n-c)/s), capped by (n-1) div s so every start stays
    # inside the doc even when stride > chunk (n = nm1 + 1)
    max_i = F.expr(
        f"CASE WHEN nm1 + 1 > {c} "
        f"THEN least((nm1 + 1 - {c} + {s} - 1) div {s}, nm1 div {s}) "
        f"ELSE 0 END"
    )
    piece = F.expr(f"slice(l, chunk_idx * {s} + 1, {c})")
    return (
        d.select(
            "doc_id",
            "l",
            F.explode(F.sequence(F.lit(0), max_i)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("long").alias("n_chunk_tokens"),
        )
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking gate over the documents table (see :func:`chunk_documents`);
    the oracle reproduces the identical 1-based slices with a positional
    struct-comprehension unnest."""
    return chunk_documents(_docs(spark, sf_dir))


def _chunk_documents_sql() -> str:
    c, s = CHUNK_TOKENS, CHUNK_STRIDE
    max_i = (
        f"CASE WHEN len(l) > {c} "
        f"THEN LEAST((len(l) - {c} + {s} - 1) // {s}, (len(l) - 1) // {s}) "
        f"ELSE 0 END"
    )
    return f"""
    SELECT doc_id,
           CAST(u.i AS BIGINT) AS chunk_idx,
           array_to_string(l[u.i * {s} + 1 : u.i * {s} + {c}], ' ') AS chunk_text,
           CAST(len(l[u.i * {s} + 1 : u.i * {s} + {c}]) AS BIGINT) AS n_chunk_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents WHERE text IS NOT NULL),
         unnest([{{'i': i}} FOR i IN range(0, ({max_i}) + 1)]) AS t(u)
    """


#: fixed-size per-language sample: eval carve-outs and audits want "exactly
#: K docs per language, uniform, reproducible" — rank by md5(doc_id) (a
#: deterministic uniform order) and keep the K smallest per language
SAMPLE_FIXED_K = 50


def sample_fixed_k(docs: DataFrame, k: int = SAMPLE_FIXED_K) -> DataFrame:
    """(lang, doc_id): exactly min(k, |lang|) documents per language,
    chosen by the k smallest md5(doc_id) — uniform w/o replacement under
    the hash's uniformity, bit-reproducible anywhere.  Rides
    ``salted_topk`` (local top-K per hash-salt bucket, then a global rank
    over <= salts x K survivors), so no language — however large at
    100 TB — is ever sorted in a single task; languages smaller than k
    come back whole.  Rows with a NULL doc_id are excluded up front: a
    NULL id has no identity to sample by, and engines disagree on where
    NULL sorts (Spark NULLS FIRST vs DuckDB NULLS LAST) so including it
    would also break cross-engine reproducibility."""
    d = docs.filter(F.col("doc_id").isNotNull()).select(
        "lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    return salted_topk(d, "lang", [F.asc("h"), F.asc("doc_id")], "doc_id", k).select(
        "lang", "doc_id"
    )


def q_sample_fixed_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-K uniform per-language sample gate (see :func:`sample_fixed_k`)."""
    return sample_fixed_k(_docs(spark, sf_dir))


def _sample_fixed_k_sql() -> str:
    return f"""
    SELECT lang, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents WHERE doc_id IS NOT NULL
    ) WHERE rk <= {SAMPLE_FIXED_K}
    """


# --------------------------------------------------- token-budget packing

#: tokens per training shard for the packing gate — small enough that the
#: documents table fills many shards, large enough that each holds several
#: docs (documents run ~100-300 whitespace tokens)
PACK_BUDGET = 2048

#: range buckets for the distributed prefix sum: the first two hex chars of
#: the md5 ordering key define 256 CONTIGUOUS ranges of the global order,
#: so per-bucket cumulative sums + a 256-row offset table compose into the
#: exact global running total without any single-partition window over data
PACK_BUCKETS_HEX = 2


def pack_token_shards(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """(doc_id, n_tokens, shard_id): deterministic token-budget shard
    packing — the sequence-packing front of a training pipeline (fill each
    shard with consecutive docs until the token budget is spent).  Docs are
    laid out in md5(doc_id) order (a deterministic shuffle, so shards are
    content-homogeneous mixes rather than source-clustered runs) and a doc
    goes to the shard its RUNNING-TOTAL START falls into:
    shard = floor(cum_before_doc / budget).  A doc straddling a boundary
    stays whole in its start shard, so a shard can exceed the budget by at
    most one document (the standard pack-whole-documents overflow rule;
    splitting is a rewrite operator's job, not an assignment's).

    Scale shape — the classic two-level distributed prefix sum, NO global
    single-partition window over the data: the md5 ordering key's first two
    hex chars range-partition the order into 256 contiguous buckets;
    per-bucket running totals are an ordinary partitioned window, bucket
    totals are 256 rows whose own running offset is driver-trivial, and one
    broadcast join composes the exact global running total.  Everything is
    integer arithmetic on both engines, so the oracle matches bit-for-bit.

    NULL ``doc_id`` rows are excluded up front, mirroring
    :func:`sample_fixed_k_per_lang`'s documented discipline: ``md5(NULL)``
    is NULL, the null-unsafe equi-join on the bucket would silently drop
    the row while its tokens still inflated the offset table, and the two
    engines order NULLs oppositely (Spark NULLS FIRST, DuckDB NULLS LAST),
    so every downstream shard id would shift."""
    d = docs.filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    ).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    d = d.withColumn("b", F.substring("h", 1, PACK_BUCKETS_HEX))
    w = (
        Window.partitionBy("b")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = d.withColumn("lcum", F.sum("n_tokens").over(w))
    # 256-row offset table: the one intentionally-global window in the plan
    # runs over bucket TOTALS (bounded by 16^PACK_BUCKETS_HEX rows), never
    # over the data
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        d.groupBy("b")
        .agg(F.sum("n_tokens").alias("btot"))
        .withColumn("off", F.coalesce(F.sum("btot").over(wb), F.lit(0)))
        .select("b", "off")
    )
    return local.join(F.broadcast(off), "b").select(
        "doc_id",
        "n_tokens",
        F.expr(f"(off + lcum - n_tokens) div {int(budget)}").alias("shard_id"),
    )


def q_pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing gate over the documents table (see
    :func:`pack_token_shards`); oracle = one SQL running-total window over
    the same md5 order, integer-exact in both engines."""
    return pack_token_shards(_docs(spark, sf_dir))


def _pack_token_shards_sql(src: str = "documents") -> str:
    """Pack oracle over any SQL relation exposing (doc_id, text) — the
    composed chunk->pack gate passes the chunk CTE as ``src``."""
    return f"""
    WITH d AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM {src} WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    c AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM d
    )
    -- the windowed sum(BIGINT) is a DuckDB HUGEINT and // keeps it; pandas
    -- materializes HUGEINT as float64, so without this cast the driver's
    -- value hash sees 62.0 vs Spark's 62 (the round-5 red row)
    SELECT doc_id, n_tokens,
           CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS shard_id
    FROM c
    """


def text_novelty(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty): fraction of a document's
    DISTINCT word k-grams that appear in NO other document — the
    novelty/boilerplate metric of curation pipelines (novelty ~ 0: the doc
    is assembled from grams that all occur elsewhere — boilerplate,
    template text, or a near-copy that slipped past dedup; novelty ~ 1:
    unique content).  The complement of `text_selfrepeat` (within-doc
    repetition) — this one measures against the CORPUS.

    Scale shape: grams travel as 60-bit md5-prefix hashes (8-byte shuffle
    keys, the `hashed_shingles` discipline — similarity is DEFINED over
    the hashed space identically in both engines); gram document-frequency
    is one map-side-combined groupBy; the join back and per-doc re-count
    shuffle only hashed keys.  Docs shorter than k tokens emit no row
    (they have no k-grams)."""
    hdist = (
        raw_shingles(docs, k)
        .select("doc_id", _tokhash_spark(F.col("sh")).alias("hh"))
        .distinct()
    )
    gramdf = hdist.groupBy("hh").agg(F.count("*").alias("df"))
    per_doc = (
        hdist.join(gramdf, "hh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_novel",
        (F.col("n_novel").cast("double") / F.col("n_grams").cast("double")).alias("novelty"),
    )


def q_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-novelty gate over the documents table (see
    :func:`text_novelty`); oracle = the same hashed-shingle df/join in
    SQL."""
    return text_novelty(_docs(spark, sf_dir))


def _text_novelty_sql() -> str:
    s = _keyed_shingles_sql("SELECT doc_id, text FROM documents", hashed=True)
    return f"""
    WITH s AS ({s}),
    d AS (SELECT sh, count(*) AS df FROM s GROUP BY 1),
    p AS (
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM s JOIN d ON s.sh = d.sh GROUP BY 1
    )
    SELECT doc_id, n_grams, n_novel,
           CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE) AS novelty
    FROM p
    """


def ref_coverage(docs: DataFrame, ref: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, n_grams, n_seen, seen_frac): for every incoming document,
    the fraction of its DISTINCT word k-grams already present ANYWHERE in a
    reference corpus — the corpus-scale contamination / memorization-risk
    score.  seen_frac ~ 1: the doc is assembled from grams the reference
    already contains (a copy, a template, or eval-set leakage); ~ 0: fresh
    content.  The RELATIONAL complement of `decontaminate_overlap`: that
    family broadcasts a small probe set over the corpus, this one scores a
    full snapshot against a full reference where neither side fits in a
    broadcast.

    Scale shape: both gram streams travel as 60-bit md5-prefix hashes
    (8-byte shuffle keys, the `hashed_shingles` discipline); the reference
    collapses to its DISTINCT gram set (one map-side-combined shuffle,
    bounded by distinct grams); the probe side left-joins on the hashed
    key and re-counts per doc.  No self-join anywhere, so no DF cap is
    needed: a stop-gram hits exactly ONE reference set row — join fan-out
    equals the natural probe stream, never a pair blow-up.  Docs shorter
    than k tokens emit no row."""
    probe = raw_shingles(docs, k).select(
        "doc_id", _tokhash_spark(F.col("sh")).alias("hh")
    )
    refstream = raw_shingles(ref, k).select(_tokhash_spark(F.col("sh")).alias("hh"))
    return ref_coverage_from_hashed(probe, refstream)


def ref_coverage_from_hashed(probe: DataFrame, refstream: DataFrame) -> DataFrame:
    """:func:`ref_coverage` over already-hashed gram streams — probe as
    ``(doc_id, hh)``, reference as ``(hh)``, duplicates allowed on both
    (each side is reduced to its distinct set here).  The retained-stream
    entry point `jobs/intake_corpus.py` shares with
    `corpus_minhash_sim_from_hashed` so both corpora are tokenized and
    hashed exactly once."""
    probe = probe.select("doc_id", "hh").distinct()
    refset = (
        refstream.select("hh").distinct().withColumn("__hit", F.lit(1).cast("long"))
    )
    per_doc = (
        probe.join(refset, "hh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_seen"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_seen",
        (F.col("n_seen").cast("double") / F.col("n_grams").cast("double")).alias(
            "seen_frac"
        ),
    )


def q_text_ref_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-coverage gate: the derived next snapshot
    (`_diff_new_snapshot`: edits, fresh copies, survivors) scored against
    the CURRENT documents table — 'removed' docs' grams still count as
    seen (they are in the reference), edited docs score high-but-<1,
    copied docs score 1.0.  Oracle = the same hashed-gram set join in
    SQL."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return ref_coverage(_diff_new_snapshot(docs), docs)


def _text_ref_coverage_sql() -> str:
    probe = _keyed_shingles_sql(_diff_new_snapshot_sql(), hashed=True)
    ref = _keyed_shingles_sql("SELECT doc_id, text FROM documents", hashed=True)
    return f"""
    WITH base AS (SELECT doc_id, text FROM documents),
    p AS ({probe}),
    r AS (SELECT DISTINCT sh FROM ({ref})),
    agg AS (
        SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN r.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_seen
        FROM p LEFT JOIN r ON p.sh = r.sh GROUP BY 1
    )
    SELECT doc_id, n_grams, n_seen,
           CAST(n_seen AS DOUBLE) / CAST(n_grams AS DOUBLE) AS seen_frac
    FROM agg
    """


#: curriculum-binning quantile grid: 3 thresholds -> 4 difficulty bins
CURRICULUM_QS = (0.25, 0.5, 0.75)


def curriculum_bins(
    docs: DataFrame, qs: tuple = CURRICULUM_QS, sigbits: int = 5
) -> DataFrame:
    """(doc_id, n_tokens, bin): SKETCH-GUIDED curriculum binning — the hg64
    histogram's quantile thresholds over the corpus token-count
    distribution, fed straight back into the pipeline to grade every
    document into len(qs)+1 difficulty bins (bin = number of thresholds
    strictly below n_tokens).  This is the composition a training pipeline
    runs for curriculum ordering / length-bucketed batching: one cheap
    mergeable sketch of the global distribution, then a full-corpus pass
    that never shuffles.

    Scale shape: the threshold side reduces to <= 1920 keyed counts and
    finalizes relationally (`hg64_quantiles_relational`, zero Python),
    pivots to ONE row, and broadcast-joins onto the corpus — the corpus
    itself is scanned once with no Exchange (plan-asserted in tests).
    Thresholds are sketch quantiles, so they inherit hg64's 2^-sigbits
    relative resolution — exactly the trade a 10^12-row curriculum pass
    wants (the alternative is a full sort).  NULL doc_id rows are excluded
    (the sampling discipline: cross-engine NULL handling)."""
    from hg64spark import relational

    d = docs.filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull()).select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    thr = relational.hg64_quantiles_relational(d, "n_tokens", list(qs), [], sigbits)
    one = thr.agg(
        *[
            F.max(F.when(F.col("q") == float(q), F.col("value"))).alias(f"t{i}")
            for i, q in enumerate(qs)
        ]
    )
    bin_expr = sum(
        (F.col("n_tokens") > F.col(f"t{i}")).cast("long") for i in range(len(qs))
    )
    return d.crossJoin(F.broadcast(one)).select(
        "doc_id", "n_tokens", bin_expr.alias("bin")
    )


def q_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-binning gate over the documents table (see
    :func:`curriculum_bins`); the oracle reproduces the hg64 quantile
    thresholds with the exact SQL sketch math and applies the same
    binning rule."""
    return curriculum_bins(_docs(spark, sf_dir))


def _curriculum_bins_sql() -> str:
    from hg64spark import sqloracle

    base = (
        "SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v "
        "FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL"
    )
    thr = sqloracle.quantiles_sql(base, "v", 5, list(CURRICULUM_QS))
    cases = " + ".join(
        f"CASE WHEN n_tokens > one.t{i} THEN 1 ELSE 0 END"
        for i in range(len(CURRICULUM_QS))
    )
    tsel = ", ".join(
        f"max(CASE WHEN q = {float(q)!r} THEN value END) AS t{i}"
        for i, q in enumerate(CURRICULUM_QS)
    )
    return f"""
    WITH thr AS ({thr}),
    one AS (SELECT {tsel} FROM thr),
    d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL)
    SELECT d.doc_id, d.n_tokens, CAST({cases} AS BIGINT) AS bin
    FROM d CROSS JOIN one
    """


# ------------------------------------------------------------ PII scrubbing

#: scrub patterns, applied IN ORDER (url before email so an address-shaped
#: token inside a URL path is redacted as part of the URL, never counted
#: twice); the pattern language is the subset shared by Java regex (Spark)
#: and RE2 (DuckDB): character classes + quantifiers only — no lookarounds,
#: no backrefs — and [.] / [0-9] instead of \. / \d so the literal needs no
#: escaping in either engine's SQL string
PII_PATTERNS = (
    # ':?=&#' are literal inside a char class in BOTH dialects — without
    # them a port, query string, or fragment (where the sensitive token
    # usually lives) would survive the redaction
    ("url", "https?://[A-Za-z0-9./_%:?=&#-]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "<EMAIL>"),
    ("idnum", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<ID>"),
)


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_url, n_email, n_idnum, clean): count and redact
    PII-shaped spans — the pre-training scrubbing pass every production
    corpus runs before anything else touches the text.

    Each pattern's count is taken on the text state that pattern actually
    sees (sequential: count url on the input, redact, count email on the
    redacted text, ...), so counts and redaction tell one consistent story
    and the DuckDB oracle can mirror the exact pipeline as nested CTEs.
    NULL text propagates to NULL counts + NULL clean in both engines.

    Scale shape: pure per-row Catalyst regexp expressions — zero Exchange
    (plan-asserted), embarrassingly parallel at any corpus size."""
    df = docs.select("doc_id", F.col(text_col).alias("__clean"))
    for name, pat, rep in PII_PATTERNS:
        df = df.withColumn(
            f"n_{name}", F.regexp_count(F.col("__clean"), F.lit(pat)).cast("long")
        ).withColumn("__clean", F.regexp_replace("__clean", pat, rep))
    return df.select(
        "doc_id",
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
        F.col("__clean").alias("clean"),
    )


def _pii_planted(docs: DataFrame) -> DataFrame:
    """documents with deterministic PII planted from doc_id (the planted-
    payload gate discipline: the oracle predicts the same spans by
    construction).  Spark `concat` is NULL-propagating, so the oracle must
    use `||`, never DuckDB's NULL-skipping `concat`."""
    sid = F.col("doc_id").cast("string")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" see https://host"), sid, F.lit(".example.org/p/"), sid),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.lit(" contact user"), sid, F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" ref 123-45-6789")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-scrub gate: plant URL/email/id payloads from doc_id, then count
    + redact (see :func:`scrub_pii`); the oracle rebuilds the same planted
    text with `||` and mirrors the sequential count/redact CTE-by-CTE."""
    return scrub_pii(_pii_planted(_docs(spark, sf_dir)))


def _scrub_pii_sql() -> str:
    (u_name, u_pat, u_rep), (e_name, e_pat, e_rep), (i_name, i_pat, i_rep) = PII_PATTERNS
    return f"""
    WITH planted AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 7 = 0 THEN ' see https://host' || CAST(doc_id AS VARCHAR)
                       || '.example.org/p/' || CAST(doc_id AS VARCHAR) ELSE '' END
               || CASE WHEN doc_id % 11 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com' ELSE '' END
               || CASE WHEN doc_id % 13 = 0 THEN ' ref 123-45-6789' ELSE '' END AS text
        FROM documents
    ),
    s1 AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{u_pat}')) AS BIGINT) AS n_{u_name},
               regexp_replace(text, '{u_pat}', '{u_rep}', 'g') AS t1
        FROM planted
    ),
    s2 AS (
        SELECT doc_id, n_{u_name},
               CAST(len(regexp_extract_all(t1, '{e_pat}')) AS BIGINT) AS n_{e_name},
               regexp_replace(t1, '{e_pat}', '{e_rep}', 'g') AS t2
        FROM s1
    )
    SELECT doc_id, n_{u_name}, n_{e_name},
           CAST(len(regexp_extract_all(t2, '{i_pat}')) AS BIGINT) AS n_{i_name},
           regexp_replace(t2, '{i_pat}', '{i_rep}', 'g') AS clean
    FROM s2
    """


# ------------------------------------------------- recency-decayed top-K

#: age-bucket width for the decayed frequency ranking (2 days: the test
#: corpus spans ~30 days -> ~15 buckets, exercising both the halving chain
#: and the beyond-horizon cutoff)
DECAY_BUCKET_US = 2 * 24 * 3600 * 1_000_000
#: an event in age bucket a contributes 2^(DECAY_HORIZON - a) for
#: a <= DECAY_HORIZON and 0 beyond — integer-exact halving decay (floats
#: like 0.9^age could never hash-match across engines; halving per bucket
#: is the same family, exactly representable)
DECAY_HORIZON = 8
DECAY_TOPK = 10


def decayed_topk_users(events: DataFrame, k: int = DECAY_TOPK) -> DataFrame:
    """(user_id, decayed): top-k users by recency-decayed event count — the
    trending/most-active ranking monitoring pipelines run over an event
    stream, with old activity aging out by integer halving instead of a
    hard window cliff.

    Scale shape: ONE map-side-combined groupBy(user) over per-row integer
    weights (shuffle bounded by distinct users, independent of N), then the
    salted two-phase exact top-k — no user is ever sorted in a single task.
    The reference timestamp is the corpus max ts (a 1-row broadcast
    cross-join, never an Exchange of the data side).  NULL user_ids are
    excluded up front (cross-engine NULL-sort divergence, the
    sample_fixed_k discipline)."""
    mx = events.agg(F.max("ts").alias("__mx"))
    aged = (
        events.filter(F.col("user_id").isNotNull())
        .crossJoin(F.broadcast(mx))
        .withColumn(
            "__age",
            F.expr(f"CAST(timestampdiff(MICROSECOND, ts, __mx) DIV {DECAY_BUCKET_US} AS INT)"),
        )
        .withColumn(
            "__w",
            F.expr(
                f"CASE WHEN __age <= {DECAY_HORIZON} THEN "
                f"shiftleft(CAST(1 AS BIGINT), {DECAY_HORIZON} - __age) "
                "ELSE CAST(0 AS BIGINT) END"
            ),
        )
    )
    per_user = (
        aged.groupBy("user_id")
        .agg(F.sum("__w").alias("decayed"))
        .filter(F.col("decayed") > 0)
        .withColumn("__g", F.lit(0))
    )
    return salted_topk(
        per_user, "__g", [F.desc("decayed"), F.asc("user_id")], "user_id", k
    ).drop("__g")


def q_decayed_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed top-K gate over the events table (see
    :func:`decayed_topk_users`); oracle = the same integer halving weights
    in SQL with ORDER BY ... LIMIT k under the identical total order."""
    return decayed_topk_users(io.read_table(spark, sf_dir, "events"))


def _decayed_topk_users_sql() -> str:
    return f"""
    WITH mx AS (SELECT max(ts) AS mx FROM events),
    aged AS (
        SELECT user_id,
               (epoch_us(mx.mx) - epoch_us(ts)) // {DECAY_BUCKET_US} AS age
        FROM events, mx WHERE user_id IS NOT NULL
    ),
    w AS (
        SELECT user_id,
               -- outer CAST: DuckDB widens sum(BIGINT) to HUGEINT, which
               -- pandas materializes as float64/object and the driver's
               -- dtype-sensitive hash rejects against Spark's int64
               CAST(sum(CASE WHEN age <= {DECAY_HORIZON}
                             THEN CAST(1 AS BIGINT) << CAST({DECAY_HORIZON} - age AS INT)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS decayed
        FROM aged GROUP BY 1
    )
    SELECT user_id, decayed FROM w WHERE decayed > 0
    ORDER BY decayed DESC, user_id ASC LIMIT {DECAY_TOPK}
    """


# ------------------------------------------------- corpus snapshot diffing

def corpus_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(doc_id, status in {'added','removed','changed'}): the incremental
    delta between two corpus snapshots — the versioning primitive behind
    incremental re-training (process only the delta, not the 100 TB
    snapshot).  Unchanged documents emit NO row.

    Scale shape: both sides project down to (doc_id, 16-hex-char md5 prefix
    of text) BEFORE the full-outer equi-join, so the shuffle carries ~25
    bytes per row instead of the documents themselves; at deployment scale
    both snapshots would be bucketed by doc_id and the join is co-located
    with no Exchange at all.  md5 is computed by both engines over UTF-8
    bytes with identical hex output, so 'changed' (hash IS DISTINCT FROM)
    is the same decision in Spark and the DuckDB oracle; NULL text hashes
    to NULL in both and compares via the null-safe inequality.

    NULL doc_id rows are the caller's responsibility: the full-outer
    join's null-rejecting equality matches NOTHING for them, so an
    unchanged NULL-id document would be DOUBLE-COUNTED as a simultaneous
    'removed' + 'added' pair (not dropped) — downstream would retract it
    and re-ingest it.  Both shipped entry points (`q_corpus_diff`,
    `jobs/diff_corpus.py`) filter/refuse NULL ids up front; do the same
    before calling this directly."""
    h = lambda df: df.select(  # noqa: E731
        "doc_id", F.substring(F.md5(F.col("text")), 1, 16).alias("h")
    )
    o = h(old).withColumnRenamed("h", "oh")
    n = h(new).withColumnRenamed("h", "nh")
    joined = o.withColumnRenamed("doc_id", "odoc").join(
        n.withColumnRenamed("doc_id", "ndoc"),
        F.col("odoc") == F.col("ndoc"),
        "full_outer",
    )
    return joined.select(
        F.coalesce("odoc", "ndoc").alias("doc_id"),
        F.when(F.col("odoc").isNull(), F.lit("added"))
        .when(F.col("ndoc").isNull(), F.lit("removed"))
        .when(~F.col("oh").eqNullSafe(F.col("nh")), F.lit("changed"))
        .alias("status"),
    ).filter(F.col("status").isNotNull())


def _diff_new_snapshot(docs: DataFrame) -> DataFrame:
    """Deterministic 'next snapshot' for the diff gate: drop doc_id % 5 == 0
    (-> removed), append a marker to doc_id % 3 == 0 (-> changed), and add
    fresh docs under doc_id + PLANT_OFFSET for doc_id % 4 == 0 (-> added)."""
    kept = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "text"
    )
    return kept.unionByName(added)


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff gate: documents vs a deterministically derived next
    snapshot (see :func:`_diff_new_snapshot`); the oracle rebuilds the same
    snapshot and diffs with a FULL OUTER JOIN over the same md5 prefixes.
    NULL doc_ids are excluded up front: a NULL id can't be tracked across
    snapshots — the full-outer join would DOUBLE-COUNT it as a
    removed+added pair (see :func:`corpus_diff`)."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id").isNotNull())
    return corpus_diff(docs, _diff_new_snapshot(docs))


def _diff_new_snapshot_sql() -> str:
    """SQL twin of :func:`_diff_new_snapshot` over the `base` CTE — ONE
    definition shared by every oracle that derives the next snapshot, so
    the planted churn arithmetic cannot drift between gates."""
    return f"""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN text || ' [edited]' ELSE text END AS text
        FROM base WHERE doc_id % 5 <> 0
        UNION ALL
        SELECT doc_id + {PLANT_OFFSET} AS doc_id, text FROM base WHERE doc_id % 4 = 0
    """


def _corpus_diff_sql() -> str:
    return f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
    new AS ({_diff_new_snapshot_sql()}),
    o AS (SELECT doc_id, substr(md5(text), 1, 16) AS oh FROM base),
    n AS (SELECT doc_id, substr(md5(text), 1, 16) AS nh FROM new),
    j AS (
        SELECT o.doc_id AS odoc, n.doc_id AS ndoc, oh, nh
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    )
    SELECT COALESCE(odoc, ndoc) AS doc_id,
           CASE WHEN odoc IS NULL THEN 'added'
                WHEN ndoc IS NULL THEN 'removed'
                WHEN oh IS DISTINCT FROM nh THEN 'changed' END AS status
    FROM j
    WHERE CASE WHEN odoc IS NULL THEN 'added'
               WHEN ndoc IS NULL THEN 'removed'
               WHEN oh IS DISTINCT FROM nh THEN 'changed' END IS NOT NULL
    """


#: sigbits for the calibration gate's reference histogram
CALIB_SIGBITS = 5


def q_calibrate_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus CALIBRATION gate: every document of the derived next
    snapshot (`_diff_new_snapshot`) is tagged with its token-count rank and
    percentile within the OLD corpus's hg64 distribution
    (`relational.hg64_calibrate`) — "is the incoming data longer than what
    we already have?", the intake-monitoring read on a new data drop.
    The reference cumulative table is densified to all buckets, so new
    docs outside the old corpus's range still rank exactly.  NULL text is
    excluded on BOTH sides (Spark's size(split(NULL)) = -1 vs DuckDB NULL
    — the sample_temperature_tokens divergence)."""
    from hg64spark import relational

    docs = _docs(spark, sf_dir).filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    ntok = lambda d: d.select(  # noqa: E731
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    out = relational.hg64_calibrate(
        ntok(_diff_new_snapshot(docs)), "n_tokens", ntok(docs), "n_tokens", CALIB_SIGBITS
    )
    return out.select("doc_id", "n_tokens", "ref_rank", "ref_pct")


def _calibrate_new_docs_sql() -> str:
    from hg64spark import sqloracle

    sb = CALIB_SIGBITS
    nk = (64 - sb + 1) * (1 << sb)
    k_v = sqloracle.key_expr("b.n_tokens", sb)
    mn = sqloracle.minval_expr("c.k", sb)
    mx = sqloracle.maxval_expr("c.k", sb)
    return f"""
    WITH base AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    oldt AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v FROM base),
    newt AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM ({_diff_new_snapshot_sql()})
    ),
    refc AS (
        SELECT {sqloracle.key_expr('v', sb)} AS k, count(*) AS cnt
        FROM oldt WHERE v IS NOT NULL GROUP BY 1
    ),
    dense AS (
        SELECT gs.k, COALESCE(refc.cnt, 0) AS cnt
        FROM (SELECT unnest(range(0, {nk})) AS k) gs
        LEFT JOIN refc ON refc.k = gs.k
    ),
    cum AS (
        SELECT k, cnt,
               coalesce(sum(cnt) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
               sum(cnt) OVER () AS pop
        FROM dense
    )
    SELECT b.doc_id, b.n_tokens,
           CAST(c.cb + CASE WHEN {mx} = {mn} THEN c.cnt
                ELSE trunc(CAST(c.cnt AS DOUBLE)
                           * (CAST(b.n_tokens - {mn} AS DOUBLE)
                              / CAST({mx} - {mn} AS DOUBLE)))
                END AS BIGINT) AS ref_rank,
           CAST(CAST(c.cb + CASE WHEN {mx} = {mn} THEN c.cnt
                ELSE trunc(CAST(c.cnt AS DOUBLE)
                           * (CAST(b.n_tokens - {mn} AS DOUBLE)
                              / CAST({mx} - {mn} AS DOUBLE)))
                END AS BIGINT) AS DOUBLE) / CAST(c.pop AS DOUBLE) AS ref_pct
    FROM newt b JOIN cum c ON {k_v} = c.k
    WHERE b.n_tokens IS NOT NULL
    """


# ------------------------------------ corpus-level MinHash similarity

#: Mersenne prime for the SQL-portable permutation family: every product in
#: (a*(h%P) + b) % P stays under 2^62, so the affine hashes are EXACT int64
#: arithmetic in both Spark and DuckDB (no xxhash64 on the oracle side)
MHSIM_P = (1 << 31) - 1
MHSIM_N = 64


def _mhsim_perm_expr() -> str:
    """The shared permutation-family expression (Spark SQL == DuckDB SQL on
    BIGINTs): h_i = (a_i * (hh % P) + b_i) % P with a_i in [1, P-1].
    Parameterized only by the permutation index column ``i`` the caller
    binds (sequence/range up to its own n_perm)."""
    p, p1 = MHSIM_P, MHSIM_P - 1
    return (
        f"((CAST(i AS BIGINT) * 1103515245) % {p1} + 1) * (hh % {p}) "
        f"+ (CAST(i AS BIGINT) * 2654435761) % {p}"
    )


def corpus_minhash_sim(
    corpus: DataFrame, group_col: str, n_perm: int = MHSIM_N
) -> DataFrame:
    """(g_a, g_b, matches, jaccard_est): corpus-LEVEL MinHash similarity —
    estimated shingle-set Jaccard between every pair of document GROUPS
    (sources, snapshots, crawls).  The training-pipeline question this
    answers is source-overlap intake triage: "how much of crawl B is
    already in crawl A?" WITHOUT comparing documents pairwise — each group
    collapses to an ``n_perm``-component signature first.

    Estimator: per group g and permutation i, sig[g][i] = min over the
    group's (hashed) shingles of an affine hash h_i; Pr[sig_a[i] ==
    sig_b[i]] = Jaccard(A, B), so matches/n_perm is an unbiased estimate
    with std err <= 1/(2*sqrt(n_perm)) (~0.0625 at 64).  Shingles are the
    60-bit md5-prefix token hashes the dedup family joins on
    (similarity is DEFINED over the hashed space, same contract as
    `minhash_neardup_pairs`); the permutation family is affine mod the
    Mersenne prime 2^31-1, chosen so BOTH engines compute it with exact
    int64 arithmetic — the oracle reproduces the signatures bit-for-bit.

    Scale shape: one narrow min-aggregate over the exploded (group, i, h)
    stream — map-side combined to <= G x n_perm rows per partition, so the
    shuffle is bounded by groups, not shingles; MIN is duplicate-
    insensitive, so the shingle stream skips distinct (no extra shuffle;
    same trick as the signature branch of `minhash_neardup_pairs`).  The
    pairwise stage is a self-join of the G x n_perm signature frame —
    frame algebra, never data.  G here is the number of SOURCES (bounded,
    ~10^2-10^4 at deployment); for a group-cardinality blowup the
    signature frame itself would need banding first.  Groups with no
    >= k-token document have no signature and emit no pair row."""
    shingled = raw_shingles(
        corpus.filter(F.col(group_col).isNotNull()).select(
            F.col(group_col).alias("doc_id"), "text"
        )
    ).select(F.col("doc_id").alias("g"), _tokhash_spark(F.col("sh")).alias("hh"))
    return corpus_minhash_sim_from_hashed(shingled, n_perm)


def corpus_minhash_sim_from_hashed(
    shingled: DataFrame, n_perm: int = MHSIM_N
) -> DataFrame:
    """:func:`corpus_minhash_sim` over an already-hashed ``(g, hh)`` shingle
    stream — the retained-stream entry point (the `_from_counts` pattern):
    a caller that also needs the hashed shingles for another operator (e.g.
    `jobs/intake_corpus.py`, which feeds the same stream to
    `ref_coverage_from_hashed`) pays for tokenize+shingle+md5 ONCE.  The
    stream may contain duplicates (MIN is duplicate-insensitive)."""
    return corpus_minhash_sim_from_sigs(
        corpus_minhash_signatures(shingled, n_perm), n_perm
    )


def corpus_minhash_signatures(
    shingled: DataFrame, n_perm: int = MHSIM_N
) -> DataFrame:
    """(g, i, m): the G x n_perm signature FRAME from a hashed ``(g, hh)``
    shingle stream — the retainable state of corpus-level similarity.
    Signatures are MIN-MERGEABLE: the signature of a union of corpora is
    the per-(g, i) min of their signature frames, so a deployment stores
    this tiny frame per snapshot and compares new drops against every past
    snapshot WITHOUT rescanning them (groupBy("g", "i").agg(min("m")) over
    unioned frames merges; pytest-asserted)."""
    # the affine coefficients depend only on i — precompute the n_perm
    # (a_i, b_i) pairs in Python and inline them as an array literal, and
    # hoist hh % P into one per-row column: the sequence+lambda form
    # re-derived a_i and b_i (two multiplies + two mods each) and re-took
    # hh % P for every one of the n_perm elements of every shingle
    # (guide §1.2 step 2 — per-task work; same values bit-for-bit, the
    # oracle SQL still derives them inline)
    p, p1 = MHSIM_P, MHSIM_P - 1
    ab = [((i * 1103515245) % p1 + 1, (i * 2654435761) % p) for i in range(n_perm)]
    ab_arr = ",".join(f"array({a}L,{b}L)" for a, b in ab)
    # posexplode the CONSTANT coefficient array and evaluate the affine hash
    # AFTER the explode (same trick as the minhash band build: no per-row
    # n_perm-element ArrayData materialization; the permutation index is the
    # explode position, exactly the old transform's element index)
    exploded = (
        shingled.select("g", (F.col("hh") % F.lit(p)).alias("__hm"))
        .select("g", "__hm", F.posexplode(F.expr(f"array({ab_arr})")).alias("i", "__ab"))
        .select("g", "i", F.expr(f"(__ab[0] * __hm + __ab[1]) % {p}").alias("h"))
    )
    return exploded.groupBy("g", "i").agg(F.min("h").alias("m"))


def corpus_minhash_sim_from_sigs(sig: DataFrame, n_perm: int = MHSIM_N) -> DataFrame:
    """Pairwise similarity from a ``(g, i, m)`` signature frame (see
    :func:`corpus_minhash_signatures`) — pure frame algebra, no corpus
    access; merge retained frames first when comparing across snapshots."""
    a = sig.select(F.col("g").alias("g_a"), "i", F.col("m").alias("ma"))
    b = sig.select(F.col("g").alias("g_b"), "i", F.col("m").alias("mb"))
    return (
        a.join(b, "i")
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(
            F.sum(F.when(F.col("ma") == F.col("mb"), 1).otherwise(0))
            .cast("long")
            .alias("matches")
        )
        .select(
            "g_a",
            "g_b",
            "matches",
            (F.col("matches").cast("double") / float(n_perm)).alias("jaccard_est"),
        )
    )


def q_corpus_minhash_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-overlap gate: pairwise corpus-level MinHash similarity between
    the documents table's `source` groups; the oracle rebuilds the exact
    same signatures in SQL (shared md5-prefix hash + mod-p affine perms)."""
    return corpus_minhash_sim(_docs(spark, sf_dir), "source")


def _corpus_minhash_sim_sql() -> str:
    n, p = MHSIM_N, MHSIM_P
    return f"""
    WITH sh AS (
        SELECT doc_id AS g, sh FROM (
            {_raw_shingles_sql("(SELECT source AS doc_id, text FROM documents WHERE source IS NOT NULL)")}
        )
    ),
    hashed AS (SELECT g, {_TOKHASH_SQL.format(x='sh')} AS hh FROM sh),
    perms AS (SELECT unnest(range(0, {n})) AS i),
    sig AS (
        SELECT g, i, min(({_mhsim_perm_expr()}) % {p}) AS m
        FROM hashed, perms GROUP BY 1, 2
    )
    SELECT a.g AS g_a, b.g AS g_b,
           CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS BIGINT) AS matches,
           CAST(CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS BIGINT)
                AS DOUBLE) / {float(n)} AS jaccard_est
    FROM sig a JOIN sig b ON a.i = b.i AND a.g < b.g
    GROUP BY 1, 2
    """


# ----------------------------------------- mixture rebalancing sampler

#: mixture-sampler bucket domain: 2^20 buckets give rate quantization of
#: ~1e-6 (the 100-bucket stratified sampler is too coarse to express e.g.
#: a 3.27% keep-rate faithfully)
MIX_M = 1 << 20


def _mix_bucket(id_col):
    """Deterministic [0, MIX_M) bucket: hash60('mix:' || id) — the
    :func:`sample_bucket` idiom at mixture resolution.  DuckDB mirror in
    :func:`_sample_to_mixture_sql`; change both or neither."""
    return (
        _tokhash_spark(F.concat(F.lit("mix:"), F.col(id_col).cast("string")))
        % MIX_M
    )


def sample_to_mixture(
    corpus: DataFrame,
    group_col: str,
    target: dict[str, float],
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Rebalance a corpus toward a TARGET group mixture, keeping as much
    data as possible: the group with the least data relative to its target
    share (the bottleneck) is kept in full, every other group is
    down-sampled so expected kept counts are proportional to ``target`` —
    the domain-mixture knob of a training-data pipeline ("make the final
    mix 40% web, 30% code, ...").

    Deterministic and engine-exact: a document is kept iff
    hash60('mix:' || id) % 2^20 < thresh(g), where thresh(g) =
    floor(2^20 * rate(g)) and rate(g) = (t_g * n_b) / (t_b * n_g) for
    bottleneck b.  The rate is computed as doubles in a PINNED op order
    (one multiply each side, one divide) so Spark and the DuckDB oracle
    produce the identical threshold; the bottleneck is the row_number-1
    group under (t/n DESC, group) — a near-tie can only swap in a group
    whose rate is within 1 ulp of 1.0, which the floor clamps identically
    in both engines.

    Scale shape: group counts are one map-side-combined groupBy over the
    group column (<= G rows out); thresholds are derived on that tiny
    frame and BROADCAST back, so the kept-row side is scan -> broadcast
    join -> filter with zero Exchange (plan-asserted in tests) — the same
    embarrassingly-parallel shape as `sample_stratified`, at 2^20-bucket
    resolution.

    Semantics: ``target`` DEFINES the output mixture — corpus groups
    absent from it (including NULL) are dropped; target groups absent
    from the corpus contribute nothing.  NULL ids hash to NULL and are
    dropped in both engines.

    ``weight_col`` (the library's weighted-operator discipline): group
    mass n_g becomes sum(weight) instead of count(*) — pass a token-count
    column to target TOKEN shares rather than document shares (mixtures
    are usually specified over tokens).  Sampling stays per-document, so
    expected token share matches the target exactly when document length
    is independent of the id hash (it is — the hash never sees the text);
    NULL weights contribute 0 mass but their rows still sample."""
    if not target:
        raise ValueError("sample_to_mixture needs a non-empty target mixture")
    for g, t in target.items():
        if g is None or not (t > 0):
            raise ValueError(
                f"target shares must be positive for non-NULL groups; got {g!r}: {t!r}"
            )
    spark = corpus.sparkSession
    tgt = local_rows_df(
        spark, [(g, float(t)) for g, t in sorted(target.items())], f"{group_col} string, __t double"
    )
    if weight_col is not None:
        wtype = dict(corpus.dtypes).get(weight_col)
        if wtype is None:
            raise ValueError(
                f"sample_to_mixture weight_col {weight_col!r} is not a column "
                f"of the corpus (columns: {corpus.columns})"
            )
        if wtype not in ("tinyint", "smallint", "int", "bigint"):
            # integral mass keeps __n exact int64 on the identical code
            # path as the unweighted count (the drift family's contract)
            raise ValueError(
                f"sample_to_mixture weight_col must be integral, got {wtype!r}"
            )
        from hg64spark.relational import _guarded_weight

        # plan-side negative guard (the sketch family's weighted contract):
        # a negative weight silently understates group mass — or net-drops
        # the group via the __n > 0 filter — so it fails the job instead
        mass = F.coalesce(F.sum(_guarded_weight(weight_col)), F.lit(0)).cast("long")
    else:
        mass = F.count("*")
    counts = (
        corpus.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(mass.alias("__n"))
        # a zero-mass group (weighted mode: all-NULL/zero weights) would
        # otherwise divide to an infinite ratio, win the bottleneck seat,
        # and zero every threshold — no mass means no seat at the mixture
        # (its rows drop via the inner threshold join)
        .filter(F.col("__n") > 0)
        .join(tgt, group_col)
    )
    from pyspark.sql import Window

    ranked = counts.withColumn(
        "__ratio", F.col("__t") / F.col("__n").cast("double")
    ).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy(F.lit(0)).orderBy(F.desc("__ratio"), F.col(group_col))
        ),
    )
    bottleneck = ranked.filter(F.col("__rn") == 1).select(
        F.col("__t").alias("__tb"), F.col("__n").cast("double").alias("__nb")
    )
    thresh = (
        ranked.crossJoin(F.broadcast(bottleneck))
        .select(
            group_col,
            F.floor(
                F.lit(float(MIX_M))
                * (
                    (F.col("__t") * F.col("__nb"))
                    / (F.col("__tb") * F.col("__n").cast("double"))
                )
            )
            .cast("long")
            .alias("__thresh"),
        )
    )
    return corpus.join(F.broadcast(thresh), group_col).filter(
        _mix_bucket(id_col) < F.col("__thresh")
    ).drop("__thresh")


MIX_TARGET = {"en": 4.0, "es": 2.0, "de": 1.0, "fr": 1.0, "zh": 1.0}


def q_sample_mixture_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-rebalance gate: documents resampled toward a 4:2:1:1:1
    language mix (see :data:`MIX_TARGET`); the oracle recomputes the same
    thresholds and bucket hashes in SQL, bit-for-bit."""
    return sample_to_mixture(
        _docs(spark, sf_dir).select("doc_id", "lang"), "lang", MIX_TARGET
    )


def _sample_to_mixture_sql() -> str:
    m = MIX_M
    tgt_rows = ", ".join(
        f"('{g}', CAST({float(t)} AS DOUBLE))" for g, t in sorted(MIX_TARGET.items())
    )
    # || not concat: DuckDB's concat() SKIPS NULL arguments, so a NULL
    # doc_id would hash as 'mix:' instead of NULL — || propagates NULL
    # like Spark's concat does (the scrub_pii oracle lesson)
    bucket = _TOKHASH_SQL.format(x="('mix:' || CAST(doc_id AS VARCHAR))")
    return f"""
    WITH tgt(lang, t) AS (VALUES {tgt_rows}),
    counts AS (
        SELECT d.lang, count(*) AS n, any_value(t.t) AS t
        FROM documents d JOIN tgt t ON d.lang = t.lang
        WHERE d.lang IS NOT NULL GROUP BY 1
    ),
    ranked AS (
        SELECT lang, n, t,
               row_number() OVER (ORDER BY t / CAST(n AS DOUBLE) DESC, lang) AS rn
        FROM counts
    ),
    thresh AS (
        SELECT r.lang,
               CAST(floor({float(m)} * ((r.t * b.nb) / (b.tb * CAST(r.n AS DOUBLE))))
                    AS BIGINT) AS th
        FROM ranked r,
             (SELECT t AS tb, CAST(n AS DOUBLE) AS nb FROM ranked WHERE rn = 1) b
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN thresh t ON d.lang = t.lang
    WHERE ({bucket}) % {m} < t.th
    """


# ------------------------------------- per-group feature standardization

#: row-emission sample for the normalization gate (stats are computed over
#: ALL rows; only every 23rd order's rows are emitted, keeping the driver
#: compare bounded)
ZNORM_EMIT_MOD = 23


def normalize_per_group(
    rows: DataFrame, group_cols: list, value_col: str, id_cols: list
) -> DataFrame:
    """Per-group z-score standardization of an integral feature — the
    feature-engineering normalization pass, exact across engines.

    Bit-exactness: with integral values, n, s = Σv and ss = Σv² are exact
    int64 (order-free), and the z-score is computed as ONE double division
    of two exactly-derived doubles:

        z = double(v·n − s) / sqrt(double(n·ss − s²))

    (the algebraic rescaling of (v − mean)/std_pop by the positive constant
    sqrt(n) — distribution shape is preserved, and the formula needs no
    intermediate mean/std doubles whose op ORDER could differ between
    engines).  A constant group (n·ss = s²) yields NULL, not a crash.

    Scale shape: the stats aggregation is map-side combined and bounded by
    the group count; the row side takes the per-group stats by BROADCAST
    join, so the data is never shuffled for normalization (plan-asserted).
    Overflow: n·ss <= N·max(v)² per group must stay under 2^63 — raise to
    decimal if a deployment's feature range needs it (the drift operators'
    numerator='decimal' pattern)."""
    v = F.col(value_col).cast("bigint")
    stats = (
        rows.groupBy(*group_cols)
        .agg(
            F.count(v).alias("__n"),
            F.sum(v).alias("__s"),
            F.sum(v * v).alias("__ss"),
        )
    )
    # NULL-SAFE join back: groupBy emits a stats row for a NULL group, and
    # a plain equi-join would silently DROP every NULL-group data row (the
    # drift family's documented NULL-group discipline; DuckDB oracles
    # mirror with IS NOT DISTINCT FROM / USING over non-NULL gates)
    srenamed = stats.select(
        *[F.col(c).alias(f"__g_{c}") for c in group_cols], "__n", "__s", "__ss"
    )
    cond = None
    for c in group_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = rows.join(F.broadcast(srenamed), cond)
    denom = F.sqrt((F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s")).cast("double"))
    z = (
        (v * F.col("__n") - F.col("__s")).cast("double")
        / F.nullif(denom, F.lit(0.0))
    ).alias("z")
    return joined.select(*id_cols, *group_cols, v.alias("v"), z)


def q_znorm_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(returnflag, linestatus) z-scores of l_quantity, stats over ALL
    60k+ rows, rows emitted for every ZNORM_EMIT_MOD-th order (the filter
    sits on the ROW side only — the oracle computes stats over the full
    table too, so a filter leaking into the aggregate would hash-mismatch)."""
    li = io.read_table(spark, sf_dir, "lineitem")
    out = normalize_per_group(
        li,
        ["l_returnflag", "l_linestatus"],
        "l_quantity",
        ["l_orderkey", "l_linenumber"],
    )
    return out.filter(F.col("l_orderkey") % ZNORM_EMIT_MOD == 0)


def _znorm_lineitem_sql() -> str:
    return f"""
    WITH stats AS (
        SELECT l_returnflag, l_linestatus,
               count(CAST(l_quantity AS BIGINT)) AS n,
               sum(CAST(l_quantity AS BIGINT)) AS s,
               sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS ss
        FROM lineitem GROUP BY 1, 2
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_linestatus,
           CAST(l.l_quantity AS BIGINT) AS v,
           CAST(CAST(l.l_quantity AS BIGINT) * st.n - st.s AS DOUBLE)
             / nullif(sqrt(CAST(st.n * st.ss - st.s * st.s AS DOUBLE)), 0.0) AS z
    FROM lineitem l
    JOIN stats st USING (l_returnflag, l_linestatus)
    WHERE l.l_orderkey % {ZNORM_EMIT_MOD} = 0
    """


def chunked_pack_units(
    docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Chunk documents and re-shape the chunks as packing units under the
    composite id "<source_doc_id>#<chunk_idx>" — THE single definition of
    the chunk->pack unit layout, shared by the driver gate
    (`q_pack_chunked_corpus`) and the production job
    (`jobs/pack_corpus.py`) so the gated computation and the job's output
    cannot drift.  Recover the parts with rsplit('#', 1): unambiguous even
    when source ids contain '#' (chunk_idx is the final all-digit
    segment)."""
    chunks = chunk_documents(docs, chunk_tokens, stride)
    return chunks.select(
        F.concat_ws(
            "#", F.col("doc_id").cast("string"), F.col("chunk_idx").cast("string")
        ).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )


def q_pack_chunked_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED gate for the chunk->pack production path
    (`jobs/pack_corpus.py --chunk-tokens`): overlapping chunking fans every
    document into context windows, each chunk becomes a packing unit under
    the composite id "<doc>#<chunk>" (`chunked_pack_units` — the same
    helper the job calls), and the two-level prefix-sum packing assigns
    shards — the whole chain mirrored in one nested-CTE oracle, so the
    job's end-to-end arithmetic (composite id layout order included) is
    driver-gated, not just spark-submit-smoked."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id").isNotNull())
    return pack_token_shards(chunked_pack_units(docs))


def _pack_chunked_corpus_sql() -> str:
    chunk_sql = _chunk_documents_sql()
    # NULL source ids filtered AFTER chunking (chunking is per-doc, so the
    # set is identical to the Spark side's pre-filter)
    units = (
        "(SELECT concat_ws('#', CAST(doc_id AS VARCHAR), CAST(chunk_idx AS VARCHAR)) AS doc_id, "
        f"chunk_text AS text FROM ({chunk_sql}) WHERE doc_id IS NOT NULL)"
    )
    return _pack_token_shards_sql(src=units)


# ------------------------------------- exact-substring spans / clustering

#: minimum repeated-substring length in TOKENS for span dedup (the
#: ExactSubstr dedup shape: production systems use ~50 BPE tokens; the gate
#: corpus' docs are short, so the gate uses 8 words)
SUBSTR_L = 8


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus exact-substring span dedup: every maximal token span
    covered by word ``SUBSTR_L``-grams that occur >= 2 times in the corpus
    (across docs OR within one doc) is reported as (doc_id, span_start,
    span_end), 1-based inclusive token indices.  This is the
    suffix-array-style "remove any repeated >= L-token substring" operator
    of training-data dedup pipelines, re-expressed relationally:

      1. positional L-gram occurrences, keyed by the 60-bit md5-prefix hash
         (8-byte shuffle keys; the hash is oracle-mirrored, so
         "repeated" is DEFINED over the hashed space in both engines);
      2. duplicated keys = one groupBy with map-side combine (the count
         stream shrinks to distinct keys per partition before shuffling),
         then a left-semi join prunes the occurrence stream;
      3. surviving start positions merge into maximal spans per doc with a
         gaps-and-islands window (bounded by doc length — never a
         corpus-wide sort).

    Scale shape: two Exchanges of the occurrence stream (the groupBy's
    combined key stream + the semi-join), one bounded per-doc window.  A
    corpus-wide repeated-substring pass is inherently a full-shingle
    shuffle; this is the minimal-shuffle relational form of it."""
    return substring_spans(augmented_corpus(spark, sf_dir))


def substring_spans(c: DataFrame, l: int = SUBSTR_L) -> DataFrame:
    """Library form of :func:`q_dedup_substring` over any (doc_id, text)
    corpus: maximal repeated->=2x ``l``-token spans as (doc_id, span_start,
    span_end)."""
    # token array projected once (see raw_shingles): split ran 3x per row
    occ = (
        c.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
        .filter(F.size("__toks") >= l)
        .select(
            "doc_id",
            "__toks",
            F.posexplode(F.expr(f"sequence(1, size(__toks) - {l - 1})")).alias("pos0", "__i"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("start"),
            _tokhash_spark(F.expr(f"array_join(slice(__toks, __i, {l}), ' ')")).alias("hh"),
        )
    )
    dup_keys = occ.groupBy("hh").agg(F.count("*").alias("cnt")).filter(F.col("cnt") >= 2).select("hh")
    starts = occ.join(dup_keys, "hh", "left_semi").select("doc_id", "start")
    w = Window.partitionBy("doc_id").orderBy("start")
    brk = F.when(F.col("start") - F.lag("start").over(w) <= l, F.lit(0)).otherwise(F.lit(1))
    islands = starts.withColumn(
        "island", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("start").cast("long").alias("span_start"),
            (F.max("start") + l - 1).cast("long").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def _dedup_substring_sql() -> str:
    l = SUBSTR_L
    return f"""
    WITH occ AS (
      SELECT doc_id, u.pos AS start, {_TOKHASH_SQL.format(x="u.sh")} AS hh
      FROM (SELECT doc_id,
                   unnest([{{'pos': i, 'sh': array_to_string(l[i:i+{l - 1}], ' ')}}
                           FOR i IN range(1, len(l) - {l - 2})]) AS u
            FROM (SELECT doc_id, string_split(text,' ') AS l FROM ({AUGMENTED_SQL})
                  WHERE len(string_split(text,' ')) >= {l}))
    ),
    starts AS (
      SELECT doc_id, start FROM occ
      WHERE hh IN (SELECT hh FROM occ GROUP BY hh HAVING count(*) >= 2)
    ),
    marked AS (
      SELECT doc_id, start,
             CASE WHEN start - lag(start) OVER (PARTITION BY doc_id ORDER BY start) <= {l}
                  THEN 0 ELSE 1 END AS brk
      FROM starts),
    islands AS (
      SELECT doc_id, start,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY start ROWS UNBOUNDED PRECEDING) AS island
      FROM marked)
    SELECT doc_id, CAST(min(start) AS BIGINT) AS span_start,
           CAST(max(start) + {l - 1} AS BIGINT) AS span_end
    FROM islands GROUP BY doc_id, island
    """


def q_dedup_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surgery step of ExactSubstr dedup: remove every token covered by
    a repeated span (from :func:`substring_spans`) and re-emit the cleaned
    text — (doc_id, clean_text, n_removed).  Docs with no repeated span
    pass through whole.

    Shape: spans aggregate to one small array per affected doc (bounded by
    doc length), LEFT-join back to the corpus, and the token cut is a
    higher-order-function expression (transform + filter against the span
    array) — per-row work O(tokens x spans-per-doc), no extra shuffle
    beyond the span computation itself.  HOF lambdas are interpreted, not
    codegen — acceptable here because the span array is tiny and the op is
    a rewrite, not a hot filter."""
    return substring_rewrite(augmented_corpus(spark, sf_dir))


def substring_rewrite(c: DataFrame, l: int = SUBSTR_L) -> DataFrame:
    """Library form of :func:`q_dedup_substring_rewrite` over any
    (doc_id, text) corpus: (doc_id, clean_text, n_removed)."""
    spans = substring_spans(c, l)
    sp = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("sps")
    )
    joined = c.join(sp, "doc_id", "left")
    toks_pos = "transform(split(text, ' '), (t, i) -> named_struct('t', t, 'p', CAST(i + 1 AS BIGINT)))"
    kept = f"filter({toks_pos}, s -> NOT exists(sps, x -> s.p >= x.span_start AND s.p <= x.span_end))"
    # materialize the kept array ONCE and ONLY for span docs: HOFs are
    # CodegenFallback expressions with no subexpression elimination, so
    # referencing `kept` in both output columns would run the
    # O(tokens x spans) filter twice per row — and most docs in a clean
    # corpus have no spans at all, so the F.when gate skips the HOF for
    # them entirely (CaseWhen branches evaluate lazily)
    with_kept = joined.withColumn(
        "__kept", F.when(F.col("sps").isNotNull(), F.expr(kept))
    )
    return with_kept.select(
        "doc_id",
        F.when(F.col("sps").isNull(), F.col("text"))
        .otherwise(F.expr("array_join(transform(__kept, k -> k.t), ' ')"))
        .alias("clean_text"),
        F.when(F.col("sps").isNull(), F.lit(0).cast("long"))
        .otherwise(F.expr("CAST(size(split(text, ' ')) - size(__kept) AS BIGINT)"))
        .alias("n_removed"),
    )


def _dedup_substring_rewrite_sql() -> str:
    return f"""
    WITH spans AS ({_dedup_substring_sql()}),
    sp AS (SELECT doc_id, list({{'a': span_start, 'b': span_end}}) AS sps
           FROM spans GROUP BY doc_id),
    docs AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM ({AUGMENTED_SQL}))
    SELECT d.doc_id,
           CASE WHEN sp.sps IS NULL THEN d.text
                -- COALESCE: DuckDB's array_to_string yields NULL for the
                -- all-tokens-removed case where Spark's array_join yields ''
                ELSE COALESCE(array_to_string(
                  [d.l[i] FOR i IN range(1, len(d.l) + 1)
                   IF len(list_filter(sp.sps, x -> i >= x.a AND i <= x.b)) = 0], ' '), '')
           END AS clean_text,
           CASE WHEN sp.sps IS NULL THEN 0
                ELSE len(d.l) - len([i FOR i IN range(1, len(d.l) + 1)
                                     IF len(list_filter(sp.sps, x -> i >= x.a AND i <= x.b)) = 0])
           END AS n_removed
    FROM docs d LEFT JOIN sp ON sp.doc_id = d.doc_id
    """


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Eagerly release a localCheckpoint's storage blocks.  There is no
    public DataFrame API for this — dropping references waits for driver
    GC + ContextCleaner (periodic GC every 30 min by default), which leaks
    executor storage across iterations in a long session — so this reaches
    the LogicalRDD through the query execution.  Best-effort: any
    internal-API change degrades it to the ContextCleaner path."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


#: iteration cap for connected components — min-label propagation converges
#: in O(graph diameter) rounds; near-dup clusters are shallow (stars/chains
#: of copies), and the loop stops at the fixpoint anyway.  At web scale the
#: standard upgrade is star-contraction (large-star/small-star), which
#: bounds rounds logarithmically; the propagation loop is the readable
#: exact form and shares its per-round plan shape (edge join + min-agg).
CC_MAX_ITERS = 20


def connected_components_min_label(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = CC_MAX_ITERS,
    normalized: bool = False,
) -> DataFrame:
    """(doc_id, canonical_id): connected components over an undirected pair
    list, canonical = min doc_id reachable.  Iterative min-label
    propagation: each round every node takes min(own label, neighbors'
    labels) via one edge join + one min-aggregation; the driver reads the
    monotone label-sum invariant from a metric observed on the round's own
    materialization job (see the loop comment) and stops at the fixpoint —
    one Spark job per round.  Deterministic: min is order-insensitive.

    ``normalized``: the caller GUARANTEES the pair rows are distinct with
    a_col < b_col strictly (true of every verified-pair producer in this
    module, whose pairs come out of a (doc_a, doc_b) aggregate with a
    doc_a < doc_b filter) — then both directions of the union are disjoint
    and already-unique, and the edge-normalization distinct (a full
    shuffle of the pair list) is skipped."""
    # materialize the edge list ONCE: the pair source is typically a whole
    # dedup pipeline (MinHash-LSH + verify), and without this every
    # propagation round would recompute it twice.  localCheckpoint keeps it
    # executor-resident; the verified pair set is orders of magnitude
    # smaller than the corpus that produced it.
    sym = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).unionAll(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    edges = (sym if normalized else sym.distinct()).localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    prev_ckpt = None
    prev_sum = None
    # empty pair list handled BEFORE the loop: the fixpoint is the empty
    # label table, and an all-empty plan is the one input on which AQE's
    # empty-relation propagation can eliminate the observed CollectMetrics
    # node below (no metrics row -> Observation.get fails); one cheap
    # isEmpty on the checkpointed frame, once per query
    converged = edges.isEmpty()
    if converged:
        labels = labels.filter(F.lit(False))
    for _ in range(max_iters):
        if converged:
            break
        # min(own, neighbors') as ONE union + groupBy-min instead of the old
        # propagate-join + apply-join: the neighbor-contribution rows and the
        # node's own (node, label) row meet in a single min-aggregation —
        # identical update rule, two fewer shuffles per round at the scale
        # where the label table no longer broadcasts (guide §2.4)
        contrib = edges.join(labels.withColumnRenamed("node", "dst"), "dst").select(
            F.col("src").alias("node"), "label"
        )
        # convergence via the EXACT monotone invariant: labels only ever
        # decrease and the node set is fixed, so sum(label) is strictly
        # decreasing until the fixpoint and equal exactly AT it (decimal(38):
        # exact for any id domain, no int64-overflow hazard at 10^12 nodes).
        # The sum rides an OBSERVE on the round's own materialization —
        # CollectMetrics aggregates during the checkpoint job, so each round
        # is ONE job instead of checkpoint-then-aggregate (the metrics fire
        # on eager localCheckpoint; verified, and obs.get below would block
        # rather than silently misreport if they ever did not)
        obs = Observation()
        new_labels = (
            contrib.unionAll(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .observe(obs, F.sum(F.col("label").cast("decimal(38,0)")).alias("s"))
            .localCheckpoint(eager=True)
        )
        cur_sum = obs.get["s"]
        if cur_sum is None:
            # decimal overflow yields NULL (non-ANSI); a None==None compare
            # must never masquerade as convergence
            raise RuntimeError("connected components: label-sum overflowed decimal(38)")
        # the previous round's checkpointed blocks are dead once this
        # round is materialized — unpersist them instead of leaking
        # executor storage across iterations (and across the bench's
        # repeated runs in one session)
        if prev_ckpt is not None:
            _unpersist_checkpoint(prev_ckpt)
        prev_ckpt = new_labels
        labels = new_labels
        if prev_sum is not None and cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(f"connected components did not converge in {max_iters} rounds")
    result = labels.select(F.col("node").alias("doc_id"), F.col("label").alias("canonical_id"))
    # hand the result back OFF the checkpoint chain so the final blocks
    # (and the edge list) can be reclaimed once the caller materializes it;
    # the label table is small (one row per clustered doc)
    out = result.localCheckpoint(eager=True)
    if prev_ckpt is not None:
        _unpersist_checkpoint(prev_ckpt)
    _unpersist_checkpoint(edges)
    return out


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = CC_MAX_ITERS,
    normalized: bool = False,
) -> DataFrame:
    """(doc_id, canonical_id) by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the production upgrade over min-label propagation: rounds
    grow with log(diameter), not diameter, so adversarial long chains
    converge in a handful of passes.

      large-star(u): m = min({u} ∪ Γ(u)); re-point every LARGER neighbor
      at m.  small-star(u): m = min of u's SMALLER neighbors; re-point u
      and its other smaller neighbors at m.  Both preserve connectivity;
      the fixpoint is a forest of stars rooted at component minima.

    Per round: two window-min passes over the (localCheckpointed,
    corpus-≪-sized) edge list; convergence = the star-forest fixpoint
    test, observed as a metric of the round's own materialization job
    (see the loop comment) — no standalone check job."""
    # materialize the raw pair list ONCE: both the contraction input and the
    # self-pair branch below derive from it, and the pair source is
    # typically a whole un-cached dedup pipeline (MinHash-LSH + verify) that
    # would otherwise be re-executed per derived branch.
    # ``normalized`` (caller-guaranteed distinct rows with a_col < b_col —
    # see connected_components_min_label): the pair list IS the normalized
    # edge set, so the self-pair branch and the normalization distinct (a
    # full shuffle of the pair list) are both skipped.
    if normalized:
        selfies = None
        edges = pairs.select(
            F.col(a_col).alias("a"), F.col(b_col).alias("b")
        ).localCheckpoint(eager=True)
    else:
        src = pairs.select(
            F.col(a_col).alias("u"), F.col(b_col).alias("v")
        ).localCheckpoint(eager=True)
        # the contraction itself only works over proper edges (u != v), but
        # a node whose ONLY pair is a self-pair (x, x) is still a singleton
        # component that min-label (and the recursive-CTE oracle) would emit
        # as (x, x) — capture those nodes up front and union them back at
        # the end so both library forms compute the same answer on general
        # pair lists
        selfies = src.filter(F.col("u") == F.col("v")).select(
            F.col("u").alias("node")
        ).distinct()
        # ONE normalized distinct replaces the old symmetrize-distinct-then-
        # filter chain: distinct over (least, greatest) of the proper pairs
        # is set-equal to distinct over both directions filtered to u < v,
        # one shuffle (of |pairs|, not 2|pairs|) and one checkpoint fewer
        edges = (
            src.filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    # Fixpoint test, folded INTO each contraction round as an observed
    # metric: the input edge set (a < b normalized) is a forest of disjoint
    # min-rooted stars iff (1) no node appears both as a root (a) and as a
    # leaf (b) and (2) no leaf has two roots.  Both contractions are then
    # the identity — large-star at a root r: m = min(r, leaves) = r (a < b),
    # so every larger neighbor re-points where it already points; large-star
    # at a leaf: no larger neighbors; small-star at a leaf x with its single
    # root r: emits exactly (r, x) — so the round's OUTPUT equals its input
    # set and serves as the final edge set.  Conversely a violating set is
    # changed by the round (a two-root leaf is re-pointed, a root-and-leaf
    # chain is shortened), so the loop keeps contracting — the max_iters
    # raise below stays the safety net.  Per node, both-roles / two-roots
    # reduce over the SAME window partition the contraction's min-neighbor
    # uses (und carries a role flag; every node is some row's center), and
    # the global any-violation max rides a CollectMetrics on the round's own
    # checkpoint job: convergence costs ZERO extra jobs per round, vs the
    # previous standalone check job per round plus one more to certify the
    # fixpoint (and the r7 protocol's full exceptAll confirmation round
    # before that).  A filter cannot leak below CollectMetrics, so the
    # metric always sees every und row (verified empirically).
    # empty edge set handled BEFORE the loop: it is the one input on which
    # AQE's empty-relation propagation can eliminate the CollectMetrics node
    # (no metrics row -> Observation.get fails), and it can only occur at
    # entry — a contraction of a non-empty non-forest is never empty (every
    # >= 2-node component keeps an edge), and a non-empty forest exits the
    # loop.  One cheap isEmpty on the checkpointed frame, once per query.
    converged = edges.isEmpty()
    for _ in range(max_iters):
        if converged:
            break
        obs = Observation()
        und = edges.select("a", "b", F.lit(0).alias("__leaf")).unionAll(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"), F.lit(1).alias("__leaf"))
        )
        # large-star: center a, neighbors b; m = min(center, min neighbor).
        # The per-center min rides a WINDOW over the same partitioning the
        # old groupBy-then-join pair needed: one exchange of und by a (plus
        # WindowExec's partition-key sort) replaces the aggregate exchange
        # AND the join that re-attached the min to every row — per round
        # that drops an exchange and both tiny broadcast-build jobs, and at
        # scale (mins past broadcast size) it drops a sort-merge join whose
        # probe side was this very frame (guide §2.4).  No distinct on und:
        # duplicate rows change no MIN, and the final distinct dedupes.
        w_center = Window.partitionBy("a")
        large = (
            und.withColumn("m", F.least(F.col("a"), F.min("b").over(w_center)))
            .withColumn(
                "__viol",
                (
                    (F.min("__leaf").over(w_center) != F.max("__leaf").over(w_center))
                    | (F.sum("__leaf").over(w_center) > 1)
                ).cast("int"),
            )
            .observe(obs, F.max("__viol").alias("bad"))
            .filter(F.col("b") > F.col("a"))
            .select(F.least("b", "m").alias("a"), F.greatest("b", "m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        # small-star over the large-star output: center u with its smaller
        # neighbors; m = their min; re-point u and the others at m.  Both
        # directions of each large edge come from ONE explode (a union of
        # two projections would evaluate the window subtree twice), and the
        # per-row (m, b) / (m, a) emissions likewise: the old form emitted
        # re-pointed rows from the join and the (m, a) center rows from the
        # aggregate side — here both fall out of the same windowed row and
        # the final distinct collapses the duplicate center emissions (the
        # dup factor is the small-star fan-in, same bound as the und dups)
        lund = large.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("e")
        ).select("e.a", "e.b")
        out = (
            lund.filter(F.col("b") < F.col("a"))
            .withColumn("m", F.min("b").over(w_center))
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("m").alias("x"), F.col("b").alias("y")),
                        F.struct(F.col("m").alias("x"), F.col("a").alias("y")),
                    )
                ).alias("e")
            )
            .select(F.least("e.x", "e.y").alias("a"), F.greatest("e.x", "e.y").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # metric available once the eager checkpoint's job finished; NULL =
        # zero und rows (empty edge set) = trivially a forest
        was_forest = not obs.get["bad"]
        _unpersist_checkpoint(edges)
        edges = out
        if was_forest:
            # the input was already a star forest, so this round was the
            # identity (argument above): `out` is the same edge set,
            # checkpointed — use it as the fixpoint
            converged = True
            break
    if not converged:
        raise RuntimeError(f"star contraction did not converge in {max_iters} rounds")
    # at convergence the edge set is a forest of disjoint min-rooted stars
    # (the loop's exit condition): every leaf b carries exactly one root, so
    # the leaf rows are distinct as-is and ship with NO exchange; only the
    # root self-labels need deduping (a root appears once per leaf), one
    # aggregate over |E| rows instead of the old distinct over 2|E|
    labels = edges.select(
        F.col("b").alias("doc_id"), F.col("a").alias("canonical_id")
    ).unionAll(
        edges.select("a").distinct()
        .select(F.col("a").alias("doc_id"), F.col("a").alias("canonical_id"))
    )
    if selfies is not None:
        # self-pair-only singletons: in no proper edge, so absent from
        # `labels` — they are their own canonical id (left_anti keeps a
        # self-paired node that ALSO has proper edges out of this union;
        # it already has a label)
        extra = selfies.join(
            labels, selfies["node"] == labels["doc_id"], "left_anti"
        ).select(F.col("node").alias("doc_id"), F.col("node").alias("canonical_id"))
        labels = labels.unionAll(extra)
    out = labels.localCheckpoint(eager=True)
    _unpersist_checkpoint(edges)
    if selfies is not None:
        _unpersist_checkpoint(src)
    return out


def q_dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The star-contraction form of near-dup clustering over the same
    verified MinHash pair set — same answer as `dedup_cluster` (one oracle
    serves both), logarithmic rounds instead of diameter-bound."""
    pairs = minhash_neardup_pairs(augmented_corpus(spark, sf_dir))
    # normalized=True: verified pairs come out of a (doc_a, doc_b) aggregate
    # with a doc_a < doc_b candidate filter — distinct rows, strict order
    return connected_components_star(pairs, normalized=True)


def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERING: MinHash-LSH verified pairs -> connected
    components -> (doc_id, canonical_id) for every doc in a cluster.  The
    keep/drop decision of a dedup pipeline is `keep iff doc_id ==
    canonical_id`; emitting the full membership keeps the gate
    information-rich.  Oracle: DuckDB recursive CTE computing min reachable
    id over the same verified pair set."""
    pairs = minhash_neardup_pairs(augmented_corpus(spark, sf_dir))
    return connected_components_min_label(pairs, normalized=True)


def _dedup_cluster_sql() -> str:
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_jaccard_pairs_sql(AUGMENTED_SQL, hashed=True)})
      WHERE jaccard >= {NEARDUP_TAU}
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(src, node) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
    )
    SELECT src AS doc_id, min(node) AS canonical_id FROM reach GROUP BY src
    """


def dedup_keep_best(corpus: DataFrame, pairs: DataFrame | None = None) -> DataFrame:
    """(doc_id, canonical_id, survivor_id): quality-aware survivor
    selection — "keep the BEST doc per near-dup cluster, not the first".
    Min-id canonicalization (what `connected_components_min_label` emits,
    and what keep-first dedup pipelines key on) silently keeps whichever
    duplicate happens to carry the smallest id; a curation pipeline wants
    the highest-quality member instead (the un-truncated original, the
    cleanest OCR pass).  Survivor = argmax over the cluster by
    (distinct-token count, then MIN doc_id on ties) — an integral metric
    with a total deterministic order, so both engines agree bit-for-bit.

    Plan shape: the pair pipeline and CC run as for `dedup_cluster`; the
    cluster membership (<= duplicate count, orders of magnitude smaller
    than the corpus) is broadcast onto the corpus scan, so the quality
    metric is computed ONLY for clustered docs and the corpus is never
    shuffled.  The argmax is two tiny aggregations over member rows
    (max-metric per cluster, then min-id among the maximal) — a window
    sort per cluster would order members a second time for no reason.
    ``pairs`` overrides the default MinHash-LSH verified pair source."""
    normalized = pairs is None  # our own verified pairs are distinct, a < b
    if pairs is None:
        pairs = minhash_neardup_pairs(corpus)
    cc = connected_components_min_label(pairs, normalized=normalized)
    # the members frame (<= duplicate count rows) feeds THREE consumers
    # (best, surv, the final projection); without a checkpoint each would
    # re-run the corpus scan + broadcast join + tokenization — the same
    # materialize-once discipline connected_components applies to its edges
    members = (
        corpus.join(F.broadcast(cc), "doc_id")
        .select(
            "doc_id",
            "canonical_id",
            F.size(F.array_distinct(F.split(F.col("text"), " "))).cast("long").alias("n_types"),
        )
        .localCheckpoint(eager=True)
    )
    best = members.groupBy("canonical_id").agg(F.max("n_types").alias("best_n"))
    surv = (
        members.join(F.broadcast(best), "canonical_id")
        .filter(F.col("n_types") == F.col("best_n"))
        .groupBy("canonical_id")
        .agg(F.min("doc_id").alias("survivor_id"))
    )
    out = (
        members.select("doc_id", "canonical_id")
        .join(F.broadcast(surv), "canonical_id")
        .select("doc_id", "canonical_id", "survivor_id")
        .localCheckpoint(eager=True)
    )
    # result is materialized — release the intermediates' executor storage
    _unpersist_checkpoint(members)
    _unpersist_checkpoint(cc)
    return out


def keepbest_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus a DEGRADED near-duplicate planted BELOW each
    original's id (last 3 tokens dropped, doc_id - PLANT_OFFSET — negative,
    collision-free).  With the copy as the cluster's MIN id, keep-first
    dedup would keep the degraded copy; survivor selection disagrees with
    canonicalization exactly where the truncation changed the DISTINCT
    token count (dropped tokens that also occur earlier leave n_types
    unchanged -> tie -> min id wins).  Verified at authoring time:
    225/476 clusters at sf0.001 (239/500 docs lose types), ~half at
    sf0.01 — the quality argmax is exercised by hundreds of real
    clusters, not decorative."""
    return augmented_corpus(spark, sf_dir, offset=-PLANT_OFFSET)


KEEPBEST_SQL = _augmented_sql(offset=-PLANT_OFFSET)


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection over a corpus whose planted
    duplicates hold the cluster-min ids: canonical_id (keep-first) and
    survivor_id (keep-best) must disagree on every planted cluster.
    Oracle: the dedup_cluster recursive-CTE components plus the same
    two-aggregation argmax."""
    return dedup_keep_best(keepbest_corpus(spark, sf_dir))


def _dedup_keep_best_sql() -> str:
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_jaccard_pairs_sql(KEEPBEST_SQL, hashed=True)})
      WHERE jaccard >= {NEARDUP_TAU}
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(src, node) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
    ),
    cc AS (SELECT src AS doc_id, min(node) AS canonical_id FROM reach GROUP BY src),
    corpus AS ({KEEPBEST_SQL}),
    members AS (
      SELECT cc.doc_id, cc.canonical_id,
             CAST(len(list_distinct(string_split(c.text, ' '))) AS BIGINT) AS n_types
      FROM cc JOIN corpus c ON c.doc_id = cc.doc_id
    ),
    best AS (SELECT canonical_id, max(n_types) AS best_n FROM members GROUP BY 1),
    surv AS (
      SELECT m.canonical_id, min(m.doc_id) AS survivor_id
      FROM members m JOIN best b
        ON b.canonical_id = m.canonical_id AND m.n_types = b.best_n
      GROUP BY 1
    )
    SELECT m.doc_id, m.canonical_id, s.survivor_id
    FROM members m JOIN surv s ON s.canonical_id = m.canonical_id
    """


# --------------------------------------------- sampling / mixing / scoring

#: per-language sampling rates (percent), the "data mixing" shape of a
#: training pipeline: downsample the dominant language, keep the rest whole.
#: Deterministic hash-bucket sampling — the only sampling that is (a)
#: reproducible across engines/runs, (b) consistent under re-partitioning,
#: (c) extensible to correlated sampling of multiple tables on a shared key.
SAMPLE_RATES_PCT = {"en": 30, "es": 100, "de": 100, "fr": 100, "zh": 60}
SAMPLE_DEFAULT_PCT = 100
SAMPLE_SALT = "smpl:"


def sample_bucket(id_col):
    """The deterministic sampling bucket in [0, 100): hash60(salt || id).
    ONE definition shared by the operator, its oracle, and
    ``jobs/curate_corpus.py`` — a drifting copy would silently break the
    reproducible-across-engines/correlated-on-shared-key guarantee.
    The DuckDB mirror is :func:`_sample_bucket_sql` — change both or
    neither."""
    return _tokhash_spark(F.concat(F.lit(SAMPLE_SALT), F.col(id_col).cast("string"))) % 100


def _sample_bucket_sql(key_col: str) -> str:
    """DuckDB mirror of :func:`sample_bucket`, shared by every sampling
    oracle so the bucket definition cannot drift between gates."""
    # || not concat: DuckDB's concat() SKIPS NULL arguments, so a NULL key
    # would hash as the bare salt (a real bucket) while Spark's concat
    # propagates NULL and drops the row — || matches Spark's semantics
    salted = f"('{SAMPLE_SALT}' || CAST({key_col} AS VARCHAR))"
    return f"({_TOKHASH_SQL.format(x=salted)}) % 100"


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: doc kept iff
    hash60(salt || doc_id) % 100 < rate(lang).  Pure codegen expressions, no
    shuffle at all — the one operator in the family that is embarrassingly
    parallel even at 100 TB.  Oracle: the identical md5-prefix bucket
    expression in DuckDB (bit-for-bit)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    bucket = sample_bucket("doc_id").alias("bucket")
    rate = F.coalesce(
        *[F.when(F.col("lang") == lg, F.lit(p)) for lg, p in sorted(SAMPLE_RATES_PCT.items())],
        F.lit(SAMPLE_DEFAULT_PCT),
    )
    return d.select("doc_id", "lang", bucket, rate.alias("rate_pct")).filter(
        F.col("bucket") < F.col("rate_pct")
    )


def _sample_stratified_sql() -> str:
    cases = " ".join(f"WHEN lang = '{lg}' THEN {p}" for lg, p in sorted(SAMPLE_RATES_PCT.items()))
    return f"""
    SELECT doc_id, lang, bucket, rate_pct FROM (
        SELECT doc_id, lang, {_sample_bucket_sql("doc_id")} AS bucket,
               CASE {cases} ELSE {SAMPLE_DEFAULT_PCT} END AS rate_pct
        FROM documents
    ) WHERE bucket < rate_pct
    """


#: keep percentage for the correlated-sampling gate
SAMPLE_CORR_PCT = 20


def q_sample_correlated_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated sampling across tables on a shared key — the property that
    makes hash-bucket sampling the production shape: sampling ``orders`` at
    SAMPLE_CORR_PCT% by bucket(o_orderkey) and filtering ``lineitem`` by the
    SAME bucket expression on l_orderkey keeps every lineitem of every kept
    order and none of a dropped one, with NO join — each table is filtered
    independently by a pure map expression.  Output: per kept order, its
    lineitem count (which only reconciles if the correlation holds)."""
    li = io.read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    kept = li.filter(sample_bucket("l_orderkey") < SAMPLE_CORR_PCT)
    return kept.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.count("*").alias("n_items")
    )


def _sample_correlated_sql() -> str:
    # the oracle takes the OTHER route on purpose: sample the orders table,
    # then join lineitem — identical output iff the bucket expressions
    # correlate across tables and engines
    return f"""
    WITH kept_orders AS (
        SELECT o_orderkey FROM orders
        WHERE {_sample_bucket_sql("o_orderkey")} < {SAMPLE_CORR_PCT}
    )
    SELECT l.l_orderkey AS orderkey, count(*) AS n_items
    FROM lineitem l JOIN kept_orders k ON k.o_orderkey = l.l_orderkey
    GROUP BY 1
    """


#: bucket granularity for temperature mixing (finer than the percent
#: buckets: derived rates are irrational)
TEMP_BUCKETS = 65536


def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language mixing — flatten the language distribution
    toward uniform by downsampling dominant languages: target counts
    t_l ∝ c_l^alpha scaled so no language upsamples, i.e. keep rate
    (c_min / c_l)^(1-alpha).  Gate pinned at alpha = 1/2, where the rate is
    sqrt(c_min/c_l): IEEE-754 sqrt and division are correctly rounded in
    BOTH engines, so the integer thresholds floor(65536 * rate) are
    bit-identical (general alpha needs pow/ln, which may differ by 1 ulp
    between libms — the production caller accepts that, a bit-exact gate
    cannot).

    Scale shape: one tiny per-language count aggregation, a 1-row broadcast
    for c_min, a broadcast join of per-language thresholds, then the same
    pure-codegen hash-bucket filter as stratified sampling — the corpus
    stream is never shuffled."""
    # NULL lang must not reach the rate table: a handful of lang-less docs
    # would otherwise set c_min (catastrophically over-downsampling every
    # real language) while the inner join below silently drops them anyway
    d = _docs(spark, sf_dir).select("doc_id", "lang").filter(F.col("lang").isNotNull())
    counts = d.groupBy("lang").agg(F.count("*").alias("c"))
    cmin = counts.agg(F.min("c").alias("cmin"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        "lang",
        F.floor(
            F.lit(float(TEMP_BUCKETS))
            * F.sqrt(F.col("cmin").cast("double") / F.col("c").cast("double"))
        )
        .cast("long")
        .alias("thr"),
    )
    bucket = (
        _tokhash_spark(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")))
        % TEMP_BUCKETS
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("thr"))
        .select("doc_id", "lang", "bucket", "thr")
    )


def q_sample_temperature_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing weighted by TOKEN budget instead of document
    count — the quantity a training mix actually allocates: language sizes
    c_l = total whitespace tokens, rates sqrt(c_min/c_l) (same bit-exact
    alpha=1/2 argument as :func:`q_sample_temperature`).  A language of
    few huge documents is downsampled like a language of many small ones."""
    # text IS NOT NULL in BOTH engines: Spark's size(split(NULL)) is -1
    # (it would silently shrink a language's token total) while DuckDB's
    # len(string_split(NULL)) is NULL (skipped by sum) — and a token-less
    # doc has nothing to contribute to a token-budget mix anyway
    d = (
        _docs(spark, sf_dir)
        .filter(F.col("lang").isNotNull() & F.col("text").isNotNull())
        .select(
            "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tok")
        )
    )
    counts = d.groupBy("lang").agg(F.sum("n_tok").alias("c"))
    cmin = counts.agg(F.min("c").alias("cmin"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        "lang",
        F.floor(
            F.lit(float(TEMP_BUCKETS))
            * F.sqrt(F.col("cmin").cast("double") / F.col("c").cast("double"))
        )
        .cast("long")
        .alias("thr"),
    )
    bucket = (
        _tokhash_spark(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")))
        % TEMP_BUCKETS
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("thr"))
        .select("doc_id", "lang", "bucket", "thr")
    )


def _sample_temperature_sql(token_weighted: bool = False) -> str:
    salted = f"concat('{SAMPLE_SALT}', CAST(doc_id AS VARCHAR))"
    bucket = f"({_TOKHASH_SQL.format(x=salted)}) % {TEMP_BUCKETS}"
    c_expr = (
        "CAST(sum(len(string_split(text, ' '))) AS BIGINT)" if token_weighted else "count(*)"
    )
    text_guard = " AND text IS NOT NULL" if token_weighted else ""
    return f"""
    WITH counts AS (SELECT lang, {c_expr} AS c FROM documents
                    WHERE lang IS NOT NULL{text_guard} GROUP BY lang),
    m AS (SELECT min(c) AS cmin FROM counts),
    rates AS (
      SELECT lang,
             CAST(floor({TEMP_BUCKETS} * sqrt(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE))) AS BIGINT) AS thr
      FROM counts, m
    )
    SELECT d.doc_id, d.lang, {bucket} AS bucket, r.thr
    FROM documents d JOIN rates r ON r.lang = d.lang
    WHERE {bucket} < r.thr{text_guard}
    """


#: per-language quality quota ("take the N best documents of each language")
QUOTA_PER_LANG = 50


def q_quota_topk_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-quota mixing: keep the top QUOTA_PER_LANG docs per language by
    a quality key (here token count, doc_id tiebreak) — the per-language
    counterpart of the vocabulary cut, built on the same salted two-phase
    exact top-k so no task ever sorts a whole language's documents."""
    d = _docs(spark, sf_dir).select(
        "lang", "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    kept = salted_topk(
        # asc_nulls_last: Spark's bare asc is NULLS FIRST while the DuckDB
        # oracle's ASC is NULLS LAST — a NULL doc_id would rank differently
        # across engines (current fixtures have none; library hardening)
        d, "lang", [F.desc("n_tokens"), F.asc_nulls_last("doc_id")], "doc_id", QUOTA_PER_LANG
    )
    return kept.select("lang", "doc_id", "n_tokens")


Q_QUOTA_TOPK_SQL = f"""
SELECT lang, doc_id, n_tokens FROM (
    SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           row_number() OVER (PARTITION BY lang ORDER BY len(string_split(text, ' ')) DESC, doc_id ASC) AS rk
    FROM documents
) WHERE rk <= {QUOTA_PER_LANG}
"""


TFIDF_TOPN = 3


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOPN} characteristic terms per document, ranked by
    (tf desc, df asc, term asc) — the tf-idf ordering expressed with INTEGER
    keys only (tf and document frequency), so the ranking is exact in both
    engines with no FP log in sight.  Scale shape: tf is one (doc, term)
    groupBy; df is one term groupBy; the join shuffles by term; the final
    window partitions by doc (bounded by document length, no skew)."""
    toks = _docs(spark, sf_dir).select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = toks.distinct().groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), F.asc("tok"))
    return (
        tf.join(dfreq, "tok")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOPN)
        .select("doc_id", F.col("tok").alias("term"), "tf", "df")
    )


Q_TFIDF_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok)
SELECT doc_id, tok AS term, tf, df FROM (
    SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
           row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfreq.df ASC, tf.tok ASC) AS rk
    FROM tf JOIN dfreq ON dfreq.tok = tf.tok
) WHERE rk <= {TFIDF_TOPN}
"""


# ------------------------------------------------- sparse keyword retrieval

#: fixed-point idf quantum: idf_q(term) = (N * 2^20) DIV df(term) — an
#: integer idf surrogate (monotone in N/df, ~6 significant decimal digits)
#: so retrieval scores are EXACT int64 sums in both engines, no FP log
IDF_Q = 1 << 20
SEARCH_TOPK = 20
#: gate query set: vocabulary words present in the synthetic corpus
SEARCH_QUERIES = {
    "q_sort": ["sort", "merge", "order"],
    "q_stream": ["stream", "window", "batch"],
    "q_join": ["join", "hash", "key"],
}


def tfidf_search(
    corpus: DataFrame, queries: dict[str, list[str]], k: int = SEARCH_TOPK
) -> DataFrame:
    """(query_id, doc_id, score, n_matched): top-``k`` documents per keyword
    query under quantized tf-idf — SPARSE retrieval, the term-based
    complement to the ANN family's dense retrieval (attribution, "which
    training docs score highest for this eval query?", retrieval-augmented
    decontamination).

    Scoring: score(q, d) = Σ_{{terms t in q matched by d}} tf(t, d) ·
    idf_q(t) with idf_q = (N · 2^20) DIV df — integer floor division, so
    scores are exact int64 and the (score desc, doc_id) ranking is a total
    order both engines reproduce bit-for-bit.  Quantization keeps ~6
    significant digits of N/df; terms absent from the corpus contribute
    nothing (standard tf-idf behavior).  Overflow bound: tf · idf_q ≤
    doclen · N · 2^20 must stay under 2^63 — fine to N ~ 10^9 at 10^3-token
    docs; swap the score to decimal past that (the drift-family pattern).

    Scale shape: tf is one map-side-combined (doc, term) groupBy; df one
    term groupBy; the query list (a few dozen terms) joins BROADCAST onto
    tf, so the corpus-sized side shuffles only for its own aggregates; the
    final top-k per query rides `salted_topk` (no query is ever sorted in
    one task, however many docs match)."""
    if not queries or any(not terms for terms in queries.values()):
        raise ValueError("tfidf_search needs >= 1 query, each with >= 1 term")
    spark = corpus.sparkSession
    # VALUES LocalRelation, not createDataFrame: the query-term frame is
    # evaluated twice (distinct-term semi-join build + the scoring join's
    # broadcast), and a pickled-RDD-backed frame pays a
    # defaultParallelism-task Python job per evaluation (localrel module
    # docstring)
    qdf = local_rows_df(
        spark,
        sorted({(q, t) for q, terms in queries.items() for t in terms}),
        "query_id string, tok string",
    )
    # left-semi the token stream to the query terms BEFORE any aggregate:
    # Catalyst cannot push a join below a groupBy, so without this the tf
    # and df aggregations would shuffle the corpus's FULL (doc, term)
    # cardinality only to discard all but a few dozen terms afterwards.
    # tf/df values for the surviving terms are unchanged; N comes from the
    # unfiltered corpus.
    qtoks = F.broadcast(qdf.select("tok").distinct())
    toks = corpus.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).join(qtoks, "tok", "left_semi")
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = toks.distinct().groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = corpus.select(F.countDistinct("doc_id").alias("__n"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "tok",
        F.expr(f"(__n * CAST({IDF_Q} AS BIGINT)) DIV df").alias("idf_q"),
    )
    scored = (
        tf.join(F.broadcast(qdf), "tok")
        .join(F.broadcast(idf), "tok")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("idf_q")).alias("score"),
            F.count("*").cast("long").alias("n_matched"),
        )
    )
    return salted_topk(
        # asc_nulls_last: match the oracle's NULLS LAST on a NULL doc_id
        scored, "query_id", [F.desc("score"), F.asc_nulls_last("doc_id")], "doc_id", k
    )


def q_tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-retrieval gate: :data:`SEARCH_QUERIES` over the documents
    table; oracle = the same integer tf·idf_q scoring and total-order
    top-k in SQL."""
    return tfidf_search(_docs(spark, sf_dir).select("doc_id", "text"), SEARCH_QUERIES)


def _tfidf_search_sql() -> str:
    vals = ", ".join(
        f"('{q}', '{t}')"
        for q, terms in sorted(SEARCH_QUERIES.items())
        for t in sorted(set(terms))
    )
    return f"""
    WITH q(query_id, tok) AS (VALUES {vals}),
    toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (
        SELECT tok, count(*) AS df
        FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    idf AS (
        SELECT tok, (n.n_docs * CAST({IDF_Q} AS BIGINT)) // df AS idf_q
        FROM dfreq, n
    ),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               CAST(sum(tf.tf * idf.idf_q) AS BIGINT) AS score,
               CAST(count(*) AS BIGINT) AS n_matched
        FROM tf JOIN q ON tf.tok = q.tok JOIN idf ON tf.tok = idf.tok
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score, n_matched FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id ASC
        ) AS rk FROM scored
    ) WHERE rk <= {SEARCH_TOPK}
    """


# ------------------------------------------------------ composed pipeline

#: corpus-pipeline gate knobs: thresholds sit inside the test data's observed
#: ranges (tokens 10..99, stop_ratio ~0.01..0.11) so every stage filters a
#: real subset; the exact-dup plant offset is distinct from PLANT_OFFSET so
#: the two augmented corpora can't collide
PIPE_MIN_TOKENS = 20
PIPE_MAX_STOP = 0.09
PIPE_DUP_OFFSET = 1 << 41


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data pipeline, one composed DataFrame plan:
    exact-dedup keep-first (over a corpus with planted exact duplicates) ->
    quality filter (min tokens, max stopword ratio) -> language-ID ->
    per-predicted-language token-count hg64 histogram.  Gates that the
    operators COMPOSE — filters and joins of independently-gated stages
    produce one Catalyst plan whose result the oracle reproduces
    bit-for-bit.  Each per-doc stage is a hash-key groupBy or broadcast
    join; nothing in the chain adds a scale hazard the component gates
    don't already cover."""
    from hg64spark import agg

    d = _docs(spark, sf_dir).select("doc_id", "text")
    dups = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + PIPE_DUP_OFFSET).alias("doc_id"), "text"
    )
    corpus = d.unionAll(dups)
    langid = q_text_langid(spark, sf_dir).select("doc_id", "predicted_lang")
    kept = curate_corpus(corpus).join(langid, "doc_id")
    sk = agg.hg64_agg(
        kept.select("predicted_lang", F.col("n_tokens").alias("v")), "v", ["predicted_lang"], 5
    )
    return agg.hg64_buckets(sk, ["predicted_lang"])


def curate_corpus(
    corpus: DataFrame, min_tokens: int = PIPE_MIN_TOKENS, max_stop: float = PIPE_MAX_STOP
) -> DataFrame:
    """The curation chain as a library function over any (doc_id, text)
    corpus: exact-dedup keep-first (min doc_id per content hash) + quality
    filter (token count, stopword ratio).  Returns
    (doc_id, text, n_tokens, stop_ratio).  Used by the driver gate
    (composed with language-ID) and by ``jobs/curate_corpus.py``."""
    keep = (
        corpus.filter(F.col("text").isNotNull())
        .groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    stopset = ",".join(f"'{s}'" for s in STOPWORDS)
    # token array projected once (see raw_shingles): split ran 3x per row
    quality = corpus.select(
        "doc_id", F.split(F.col("text"), " ").alias("__toks")
    ).select(
        "doc_id",
        F.size("__toks").cast("long").alias("n_tokens"),
        (
            F.expr(f"size(filter(__toks, x -> x IN ({stopset})))").cast("double")
            / F.size("__toks").cast("double")
        ).alias("stop_ratio"),
    )
    return corpus.join(keep, "doc_id", "left_semi").join(
        quality.filter((F.col("n_tokens") >= min_tokens) & (F.col("stop_ratio") <= max_stop)),
        "doc_id",
    )


def _corpus_pipeline_sql() -> str:
    from hg64spark import sqloracle

    stopset = ",".join(f"'{s}'" for s in STOPWORDS)
    base = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {PIPE_DUP_OFFSET} AS doc_id, text FROM documents WHERE doc_id % 7 = 0
    ),
    keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
    q AS (
        SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(l, x -> x IN ({stopset}))) AS DOUBLE)
                   / CAST(len(l) AS DOUBLE) AS stop_ratio
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM corpus)
    ),
    lang AS (SELECT doc_id, predicted_lang FROM ({Q_TEXT_LANGID_SQL}))
    SELECT lang.predicted_lang, q.n_tokens AS v
    FROM corpus c
    JOIN keep k ON k.doc_id = c.doc_id
    JOIN q ON q.doc_id = c.doc_id
         AND q.n_tokens >= {PIPE_MIN_TOKENS} AND q.stop_ratio <= {PIPE_MAX_STOP}
    JOIN lang ON lang.doc_id = c.doc_id
    """
    return sqloracle.buckets_sql(base, "v", 5, ["predicted_lang"])


def dataops_queries():
    return {
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "text_winnow": q_text_winnow,
        "token_count_hist": q_token_count_hist,
        "token_count_bpe": q_token_count_bpe,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_topk": q_dedup_ngram_topk,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "ann_brute_topk": q_ann_brute_topk,
        "ann_lsh_recall": q_ann_lsh_recall,
        "ann_ivf_recall": q_ann_ivf_recall,
        "multimodal_payloads": q_multimodal_payloads,
        "multimodal_image_decode": q_multimodal_image_decode,
        "multimodal_audio_decode": q_multimodal_audio_decode,
        "curriculum_bins": q_curriculum_bins,
        "pack_chunked_corpus": q_pack_chunked_corpus,
        "text_novelty": q_text_novelty,
        "corpus_pipeline": q_corpus_pipeline,
        "sample_stratified": q_sample_stratified,
        "sample_correlated_lineitem": q_sample_correlated_lineitem,
        "sample_temperature": q_sample_temperature,
        "sample_temperature_tokens": q_sample_temperature_tokens,
        "quota_topk_by_lang": q_quota_topk_by_lang,
        "tfidf_top_terms": q_tfidf_top_terms,
        "text_selfrepeat": q_text_selfrepeat,
        "decontaminate_overlap": q_decontaminate_overlap,
        "decontaminate_bloom": q_decontaminate_bloom,
        "decontaminate_neardup": q_decontaminate_neardup,
        "decontaminate_neardup_bloom": q_decontaminate_neardup_bloom,
        "pack_token_shards": q_pack_token_shards,
        "chunk_documents": q_chunk_documents,
        "sample_fixed_k_per_lang": q_sample_fixed_k_per_lang,
        "dedup_substring": q_dedup_substring,
        "dedup_substring_rewrite": q_dedup_substring_rewrite,
        "dedup_cluster": q_dedup_cluster,
        "dedup_cluster_star": q_dedup_cluster_star,
        "dedup_keep_best": q_dedup_keep_best,
        "scrub_pii": q_scrub_pii,
        "decayed_topk_users": q_decayed_topk_users,
        "corpus_diff": q_corpus_diff,
        "znorm_lineitem": q_znorm_lineitem,
        "calibrate_new_docs": q_calibrate_new_docs,
        "corpus_minhash_sim": q_corpus_minhash_sim,
        "sample_mixture_langs": q_sample_mixture_langs,
        "text_ref_coverage": q_text_ref_coverage,
        "embedding_centroid_drift": q_embedding_centroid_drift,
        "tfidf_search": q_tfidf_search,
        "embedding_dispersion": q_embedding_dispersion,
    }


def dataops_oracles():
    return {
        "text_quality": Q_TEXT_QUALITY_SQL,
        "text_langid": Q_TEXT_LANGID_SQL,
        "text_fingerprint": Q_TEXT_FINGERPRINT_SQL,
        "text_winnow": Q_TEXT_WINNOW_SQL,
        "token_count_hist": token_count_hist_sql(),
        "token_count_bpe": Q_TOKEN_COUNT_BPE_SQL,
        "dedup_exact": Q_DEDUP_EXACT_SQL,
        "dedup_ngram_topk": Q_DEDUP_NGRAM_SQL,
        "dedup_minhash_lsh": Q_DEDUP_MINHASH_SQL,
        "dedup_simhash": Q_DEDUP_SIMHASH_SQL,
        "dedup_embedding_cosine": Q_DEDUP_EMB_COSINE_SQL,
        "ann_brute_topk": Q_ANN_BRUTE_SQL,
        "ann_lsh_recall": Q_ANN_LSH_SQL,
        "ann_ivf_recall": Q_ANN_IVF_SQL,
        "multimodal_payloads": Q_MULTIMODAL_SQL,
        "multimodal_image_decode": Q_MM_IMAGE_SQL,
        "multimodal_audio_decode": Q_MM_AUDIO_SQL,
        "curriculum_bins": _curriculum_bins_sql(),
        "pack_chunked_corpus": _pack_chunked_corpus_sql(),
        "text_novelty": _text_novelty_sql(),
        "corpus_pipeline": _corpus_pipeline_sql(),
        "sample_stratified": _sample_stratified_sql(),
        "sample_correlated_lineitem": _sample_correlated_sql(),
        "sample_temperature": _sample_temperature_sql(),
        "sample_temperature_tokens": _sample_temperature_sql(token_weighted=True),
        "quota_topk_by_lang": Q_QUOTA_TOPK_SQL,
        "tfidf_top_terms": Q_TFIDF_SQL,
        "text_selfrepeat": _text_selfrepeat_sql(),
        "decontaminate_overlap": _decontaminate_sql(),
        # the Bloom-pruned variant must reach the SAME answer as the exact
        # broadcast operator — one oracle serves both
        "decontaminate_bloom": _decontaminate_sql(),
        "decontaminate_neardup": _decontaminate_neardup_sql(),
        # Bloom-pruned variant must reach the same answer — one oracle
        "decontaminate_neardup_bloom": _decontaminate_neardup_sql(),
        "pack_token_shards": _pack_token_shards_sql(),
        "chunk_documents": _chunk_documents_sql(),
        "sample_fixed_k_per_lang": _sample_fixed_k_sql(),
        "dedup_substring": _dedup_substring_sql(),
        "dedup_substring_rewrite": _dedup_substring_rewrite_sql(),
        "dedup_cluster": _dedup_cluster_sql(),
        "dedup_keep_best": _dedup_keep_best_sql(),
        # star contraction must reach the SAME components — one oracle both
        "dedup_cluster_star": _dedup_cluster_sql(),
        "scrub_pii": _scrub_pii_sql(),
        "decayed_topk_users": _decayed_topk_users_sql(),
        "corpus_diff": _corpus_diff_sql(),
        "znorm_lineitem": _znorm_lineitem_sql(),
        "calibrate_new_docs": _calibrate_new_docs_sql(),
        "corpus_minhash_sim": _corpus_minhash_sim_sql(),
        "sample_mixture_langs": _sample_to_mixture_sql(),
        "text_ref_coverage": _text_ref_coverage_sql(),
        "embedding_centroid_drift": _embedding_centroid_drift_sql(),
        "tfidf_search": _tfidf_search_sql(),
        "embedding_dispersion": _embedding_dispersion_sql(),
    }
