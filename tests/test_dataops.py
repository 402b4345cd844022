"""Data-pipeline operator tests: dedup semantics, similarity correctness,
multimodal plumbing.  (Cross-engine exactness of each operator is gated by
the DuckDB oracle harness; these tests check the *semantics*.)"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hg64spark import dataops

SF_DIR = "/root/testdata/sf0.001"


def test_planted_neardups_found_with_full_recall(spark):
    """Every planted near-duplicate pair (doc, doc+PLANT_OFFSET) must be found by
    the MinHash+LSH pipeline, and nothing else at tau."""
    found = dataops.q_dedup_minhash_lsh(spark, SF_DIR).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in found}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    planted = {(i, i + dataops.PLANT_OFFSET) for i in range(n_docs)}
    missing = planted - pairs
    assert not missing, f"LSH missed planted pairs: {sorted(missing)[:5]}"
    extras = pairs - planted
    for a, b in extras:  # any extra pair must genuinely clear tau
        pass
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in found}
    assert all(j >= dataops.NEARDUP_TAU for j in jac.values())


def test_topk_tokens_per_lang_exact_with_huge_vocab(spark):
    """The salted two-phase vocabulary cut must return exactly the naive
    single-window top-K, including at a planted vocabulary far larger than K
    and than any one salt bucket (the web-scale shape the two-phase form
    exists for), with count ties broken identically."""
    from pyspark.sql import Window

    n = 9_000
    counts = spark.range(n).select(
        F.when(F.col("id") < 8_000, F.lit("big")).otherwise(F.lit("small")).alias("cand"),
        F.concat(F.lit("tok"), F.col("id")).alias("tok"),
        # heavy tie mass: only 50 distinct counts across 8000 tokens
        (F.col("id") % 50 + 1).cast("long").alias("cnt"),
    )
    k = 100
    got = dataops.topk_tokens_per_lang(counts, k).collect()
    w = Window.partitionBy("cand").orderBy(F.desc("cnt"), F.asc("tok"))
    naive = (
        counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk").collect()
    )
    key = lambda r: (r["cand"], r["tok"], r["cnt"])
    assert sorted(map(key, got)) == sorted(map(key, naive))
    assert len(got) == k + min(k, 1_000)


def test_decontaminate_plan_broadcasts_and_prunes_before_distinct(spark):
    """The exact decontamination operator must join the probe set broadcast
    (eval sets are small) and must NOT shuffle the corpus shingle stream
    below that join — the distinct belongs AFTER the prune, on the tiny
    survivor set."""
    plan = (
        dataops.q_decontaminate_overlap(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # the corpus side feeds the broadcast join straight from the scan: the
    # only Exchanges allowed are the post-join distinct/aggregate and the
    # probe-side build
    join_pos = plan.find("BroadcastHashJoin")
    corpus_section = plan[join_pos:]
    # below (after, in the printed tree) the join sit the two inputs; the
    # STREAMED corpus input must show no Exchange before the generate/scan
    streamed = corpus_section.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in streamed, plan


def test_bloom_prune_corpus_side_is_never_shuffled(spark):
    """The distributed Bloom prune must keep the probed stream map-side
    only: its bit tests are broadcast joins, so the ONLY Exchanges in the
    prune plan are BroadcastExchanges (words table) and the words build's
    own (tiny, probe-side) hash aggregation — never a hashpartitioning of
    the probed stream itself."""
    from hg64spark import relational
    from hg64spark.sketches import Bloom

    big = spark.range(1000).selectExpr("id AS doc_id", "concat('sh', id % 97) AS sh")
    probe = spark.range(40).selectExpr("concat('sh', id) AS sh")
    n_bits, n_hashes = Bloom.params_for_capacity(64)
    words = relational.bloom_words_relational(probe, "sh", n_bits, n_hashes)
    pruned = relational.bloom_prune_relational(big, "sh", words, n_bits, n_hashes)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the words-build aggregation exchanges PROBE rows; strip every
    # broadcast subtree's description and require that what remains of the
    # probed side shows no hash repartitioning
    streamed_top = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in streamed_top, plan
    # no false negatives: every inserted value survives the prune
    got = {r["sh"] for r in pruned.collect()}
    expected = {f"sh{i}" for i in range(40)}
    assert expected <= got
    # null probe values are dropped, not hashed
    with_null = spark.createDataFrame([("sh1",), (None,)], "sh string")
    kept = relational.bloom_prune_relational(with_null, "sh", words, n_bits, n_hashes).collect()
    assert [r["sh"] for r in kept] == ["sh1"]


def test_substring_spans_merges_maximal_islands(spark):
    """Two docs share an 11-token prefix; with l=8 the duplicated 8-gram
    starts are {1,2,3,4} in both docs, which must merge into ONE maximal
    span [1, 11] each — and the non-shared tails must produce nothing."""
    a = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 ax ay az aw av au at as"
    b = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 bx by bz bw bv bu bt bs"
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dataops.substring_spans(df, l=8).collect()
    }
    assert got == {(0, 1, 11), (1, 1, 11)}
    # intra-doc repetition counts too: one doc repeating its own 8-gram
    c = "r1 r2 r3 r4 r5 r6 r7 r8 mid1 mid2 r1 r2 r3 r4 r5 r6 r7 r8"
    df2 = spark.createDataFrame([(7, c)], "doc_id long, text string")
    got2 = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dataops.substring_spans(df2, l=8).collect()
    }
    assert got2 == {(7, 1, 8), (7, 11, 18)}


def test_substring_rewrite_cuts_exactly_the_spans(spark, monkeypatch):
    """The rewrite must remove precisely the tokens inside repeated spans
    and pass untouched docs through whole (n_removed = 0)."""
    monkeypatch.setattr(dataops, "augmented_corpus", lambda spark, sf_dir: spark.createDataFrame(
        [
            (0, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 ax ay az aw av au at"),
            (1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 bx by bz bw bv bu bt"),
            (2, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 unique tail here only once"),
        ],
        "doc_id long, text string",
    ))
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in dataops.q_dedup_substring_rewrite(spark, "unused").collect()}
    assert got[0] == ("ax ay az aw av au at", 11)
    assert got[1] == ("bx by bz bw bv bu bt", 11)
    assert got[2][1] == 0 and got[2][0].startswith("u1 u2")


def test_substring_spans_matches_bruteforce_on_random_corpora(spark):
    """Oracle-independent check: spans computed by the relational pipeline
    must equal a direct Python reference (hash the L-grams, count, merge
    islands) on random corpora with planted repeats — guards the window
    arithmetic against a correlated bug in the SQL oracle."""
    import hashlib

    import numpy as np

    def ref_spans(docs, l):
        occ = {}
        for doc_id, text in docs:
            toks = text.split(" ")
            for i in range(len(toks) - l + 1):
                sh = " ".join(toks[i : i + l])
                h = int(hashlib.md5(sh.encode()).hexdigest()[:15], 16)
                occ.setdefault(h, []).append((doc_id, i + 1))
        dup_starts = {}
        for h, locs in occ.items():
            if len(locs) >= 2:
                for doc_id, start in locs:
                    dup_starts.setdefault(doc_id, set()).add(start)
        out = set()
        for doc_id, starts in dup_starts.items():
            ss = sorted(starts)
            lo = prev = ss[0]
            for s in ss[1:]:
                if s - prev > l:
                    out.add((doc_id, lo, prev + l - 1))
                    lo = s
                prev = s
            out.add((doc_id, lo, prev + l - 1))
        return out

    rng = np.random.default_rng(5)
    for trial in range(2):
        docs = []
        vocab = [f"w{i}" for i in range(30)]
        for d in range(12):
            toks = [vocab[i] for i in rng.integers(0, len(vocab), 25)]
            docs.append((d, " ".join(toks)))
        # plant a shared 9-token phrase into two docs at random offsets
        phrase = [f"p{trial}_{i}" for i in range(9)]
        for d in (3, 7):
            toks = docs[d][1].split(" ")
            off = int(rng.integers(0, 10))
            docs[d] = (d, " ".join(toks[:off] + phrase + toks[off:]))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in dataops.substring_spans(df, l=6).collect()
        }
        assert got == ref_spans(docs, 6), trial


def test_connected_components_chain_and_islands(spark):
    """A 5-node chain needs several propagation rounds; two disjoint
    clusters must keep distinct canonicals; the fixpoint must be exact."""
    pairs = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1), (10, 11)], "doc_a long, doc_b long"
    )
    out = dataops.connected_components_min_label(pairs)
    got = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    dataops._unpersist_checkpoint(out)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_connected_components_empty_pairs(spark):
    """An empty pair list must yield an empty label table from BOTH CC
    forms and BOTH normalization paths — this is the input where the loops'
    convergence metrics would be optimized away with the plan (AQE empty
    propagation), so it is handled by the pre-loop isEmpty guard."""
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    for normalized in (False, True):
        assert dataops.connected_components_min_label(empty, normalized=normalized).count() == 0
        assert dataops.connected_components_star(empty, normalized=normalized).count() == 0


def test_connected_components_normalized_flag_equivalence(spark):
    """normalized=True (caller guarantees distinct a < b pair rows) must
    compute the identical labels as the general path, for both CC forms —
    the flag only skips the normalization distinct / self-pair branch."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(dataops.connected_components_min_label(pairs, normalized=True)) == rows(
        dataops.connected_components_min_label(pairs)
    )
    assert rows(dataops.connected_components_star(pairs, normalized=True)) == rows(
        dataops.connected_components_star(pairs)
    )


def test_dedup_keep_best_argmax_and_ties(spark):
    """Survivor selection with an exactly-known answer: in a 3-doc cluster
    the max-distinct-token doc wins regardless of id order; a second
    cluster's argmax is independent (its higher id wins on quality); on a
    true type-count tie the MIN id wins (the {20,21} identical-text pair);
    every member row carries both its canonical and its cluster's
    survivor."""
    corpus = spark.createDataFrame(
        [
            # cluster {1,2,3}: doc 3 has the most distinct tokens, doc 1 is
            # the min id -> canonical 1, survivor 3
            (1, "a b a b a b a b"),
            (2, "a b c a b c a b"),
            (3, "a b c d e f g h"),
            # cluster {10,11}: the HIGHER id wins on quality (doc 11 has 5
            # distinct tokens vs doc 10's 4) — argmax, not min-id; the true
            # tie case is the {20,21} block below
            (10, "p q r s p q r s"),
            (11, "p q r s p q r t"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    res = dataops.dedup_keep_best(corpus, pairs=pairs)
    out = {
        r["doc_id"]: (r["canonical_id"], r["survivor_id"]) for r in res.collect()
    }
    dataops._unpersist_checkpoint(res)
    assert out == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        10: (10, 11),  # doc 11 has 5 distinct tokens vs doc 10's 4
        11: (10, 11),
    }, out
    # true tie: identical texts -> min id survives
    tie = spark.createDataFrame(
        [(20, "x y z x"), (21, "x y z x")], "doc_id long, text string"
    )
    tp = spark.createDataFrame([(20, 21)], "doc_a long, doc_b long")
    res2 = dataops.dedup_keep_best(tie, pairs=tp)
    got = {r["doc_id"]: r["survivor_id"] for r in res2.collect()}
    dataops._unpersist_checkpoint(res2)
    assert got == {20: 20, 21: 20}, got


def test_star_contraction_matches_min_label(spark):
    """large-star/small-star contraction must compute exactly the same
    components as min-label propagation — on a long chain (the adversarial
    diameter case it exists for), a random sparse graph, and a star."""
    import numpy as np

    cases = [
        [(i, i + 1) for i in range(30)],  # 31-node chain, diameter 30
        [(0, i) for i in range(1, 12)],  # star
        # self-pairs: a node whose ONLY pair is (x, x) is a singleton
        # component both forms must emit as (x, x); a self-pair on a node
        # with proper edges must NOT duplicate or relabel it
        [(7, 7), (1, 2), (2, 2)],
        [(3, 3)],
    ]
    rng = np.random.default_rng(11)
    for _ in range(2):  # random sparse graphs (self-pairs included)
        n = 40
        e = rng.integers(0, n, size=(45, 2))
        cases.append([(int(a), int(b)) for a, b in e])
    for pairs_list in cases:
        pairs = spark.createDataFrame(pairs_list, "doc_a long, doc_b long")
        # the chain needs diameter rounds under min-label (that cost IS why
        # the star variant exists); star stays within the default cap
        a = dataops.connected_components_min_label(pairs, max_iters=40)
        b = dataops.connected_components_star(pairs)
        got_a = {(r["doc_id"], r["canonical_id"]) for r in a.collect()}
        got_b = {(r["doc_id"], r["canonical_id"]) for r in b.collect()}
        dataops._unpersist_checkpoint(a)
        dataops._unpersist_checkpoint(b)
        assert got_a == got_b, (sorted(got_a - got_b), sorted(got_b - got_a))


def test_connected_components_releases_checkpoint_storage(spark):
    """The propagation loop localCheckpoints a frame per round; all but the
    returned result must be unpersisted — otherwise repeated calls in a
    long session accumulate dead storage blocks (ContextCleaner's periodic
    GC defaults to every 30 min)."""
    sc = spark.sparkContext

    def block_ids():
        # SET of persisted RDD ids: immune to OTHER tests' stray blocks
        # being reclaimed concurrently (count deltas are order-dependent)
        return {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}

    before = block_ids()
    pairs = spark.createDataFrame([(5, 4), (4, 3), (3, 2), (2, 1)], "doc_a long, doc_b long")
    out = dataops.connected_components_min_label(pairs)
    out.collect()
    # only the returned result's own checkpoint may remain
    new = block_ids() - before
    assert len(new) <= 1, new
    dataops._unpersist_checkpoint(out)
    assert block_ids() - before == set()


def test_sample_temperature_flattens_and_keeps_smallest(spark):
    """alpha=1/2 mixing: the smallest language is kept whole (rate 1), and
    the kept distribution is strictly flatter than the input (max/min count
    ratio shrinks toward its square root)."""
    import math

    inp = {
        r["lang"]: r["cnt"]
        for r in dataops._docs(spark, SF_DIR).groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    kept_rows = dataops.q_sample_temperature(spark, SF_DIR).collect()
    kept = {}
    for r in kept_rows:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    lo = min(inp, key=inp.get)
    assert kept[lo] == inp[lo]  # smallest language: threshold 65536, all kept
    ratio_in = max(inp.values()) / min(inp.values())
    ratio_out = max(kept.values()) / min(kept.values())
    # expected kept ratio ~ sqrt(ratio_in); allow hash-sampling noise
    assert ratio_out < ratio_in and ratio_out < math.sqrt(ratio_in) * 1.5, (ratio_in, ratio_out)


def test_sample_stratified_plan_is_shuffle_free(spark):
    """Deterministic hash-bucket sampling must stay embarrassingly parallel:
    any Exchange in its plan means the filter stopped being a pure map — the
    property that makes it THE sampling shape at 100 TB."""
    plan = dataops.q_sample_stratified(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_quota_and_tfidf_plans_have_no_theta_join(spark):
    for q in (dataops.q_quota_topk_by_lang, dataops.q_tfidf_top_terms):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_ivf_train_sampling_keeps_centroid_count(spark):
    """sample_mod must only thin the Lloyd training passes — the centroid
    count K (seeded from the FULL vector set) must not shrink, or the
    quantizer geometry silently changes under the recall gate."""
    e = dataops._scaled(spark, SF_DIR)
    full = dataops._ivf_train(spark, e, iters=1)
    sampled = dataops._ivf_train(spark, e, iters=1, sample_mod=3)
    assert sampled.count() == full.count()
    assert {r["cid"] for r in sampled.select("cid").collect()} == {
        r["cid"] for r in full.select("cid").collect()
    }


def test_ivf_train_local_matches_distributed_bit_for_bit(spark):
    """The default numpy Lloyd trainer and the DataFrame-only trainer must
    produce byte-identical centroids: dots and cluster sums are exact int64
    in both, |c|^2 < 2^53 keeps the JVM's double folds exact, so every
    derived double is the same IEEE value (the docstring's argument — this
    test is what makes it load-bearing)."""
    e = dataops._scaled(spark, SF_DIR)
    local = dataops._ivf_train(spark, e, iters=2, sample_mod=3)
    dist = dataops._ivf_train(spark, e, iters=2, sample_mod=3, distributed=True)
    as_map = lambda df: {r["cid"]: list(r["ce"]) for r in df.collect()}  # noqa: E731
    assert as_map(local) == as_map(dist)


def test_ivf_rank_blas_matches_catalyst_bit_for_bit(spark):
    """The mapInPandas matmul ranker must reproduce the Catalyst window
    ranker exactly, including argmax tie resolution to the lowest cid."""
    e = dataops._scaled(spark, SF_DIR)
    cents = dataops._ivf_train(spark, e, iters=1)
    rows = lambda df: sorted(  # noqa: E731
        (r["vec_id"], r["cid"], r["rn"]) for r in df.collect()
    )
    for n in (1, 3):
        assert rows(dataops._ivf_rank_blas(e, cents, n)) == rows(
            dataops._ivf_rank(e, cents, n)
        )


def test_band_codes_blas_matches_catalyst_bit_for_bit(spark):
    """The mapInPandas matmul band-code builder must reproduce the Catalyst
    explode/join/aggregate form exactly — same xxhash64-parity hyperplane
    family, same integer code assembly — at the cosine-dedup geometry and a
    smaller odd one."""
    e = dataops._aug_embeddings(spark, SF_DIR)
    rows = lambda df: sorted(  # noqa: E731
        (r["vec_id"], r["band"], r["code"]) for r in df.collect()
    )
    for planes, bands in ((dataops.COSDUP_PLANES, dataops.COSDUP_BANDS), (24, 4)):
        assert rows(
            dataops._band_codes_blas(e, planes, bands, dim=dataops.EMB_DIM)
        ) == rows(dataops._band_codes_df(e, planes, bands, dim=dataops.EMB_DIM))


def test_band_codes_blas_rejects_ragged_vectors(spark):
    """A vector whose length differs from the declared dim must fail loudly
    (the Catalyst twin raises through its plan-side guard; the matmul twin
    must not silently zero-pad)."""
    bad = spark.createDataFrame(
        [(1, [1000000] * dataops.EMB_DIM), (2, [1000000] * 3)],
        "vec_id long, se array<bigint>",
    )
    with pytest.raises(Exception, match="dim"):
        dataops._band_codes_blas(bad, 8, 2, dim=dataops.EMB_DIM).collect()


def test_ivf_local_train_cap_raises(spark):
    """The LIMIT-guarded collect must refuse, not flood the driver."""
    import pytest

    e = dataops._scaled(spark, SF_DIR)
    orig = dataops.IVF_LOCAL_TRAIN_CAP
    dataops.IVF_LOCAL_TRAIN_CAP = 10
    try:
        with pytest.raises(ValueError, match="training sample exceeds 10"):
            dataops._ivf_train(spark, e, iters=1)
    finally:
        dataops.IVF_LOCAL_TRAIN_CAP = orig
    # the score-matrix PRODUCT guard must fire even when both row caps pass
    orig_elems = dataops.IVF_LOCAL_SCORE_ELEMS
    dataops.IVF_LOCAL_SCORE_ELEMS = 1
    try:
        with pytest.raises(ValueError, match="score matrix"):
            dataops._ivf_train(spark, e, iters=1)
    finally:
        dataops.IVF_LOCAL_SCORE_ELEMS = orig_elems


def test_simhash_separates_planted_pairs(spark):
    rows = dataops.q_dedup_simhash(spark, SF_DIR).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    planted_found = sum((i, i + dataops.PLANT_OFFSET) in pairs for i in range(n_docs))
    # dropping 3 tokens barely moves the simhash: most planted pairs at <= 8
    assert planted_found >= 0.8 * n_docs


def test_ann_brute_blas_matches_catalyst_bit_for_bit(spark):
    """The mapInPandas local-top-K form must reproduce the Catalyst
    explode-join form exactly (dots are exact int64 in both; the (dot desc,
    neighbor asc) tiebreak is a total order, so batch-local pruning cannot
    change the global top-K)."""
    rows = lambda df: sorted(  # noqa: E731
        (r["probe_id"], r["neighbor_id"], r["dot"], r["rank"]) for r in df.collect()
    )
    assert rows(dataops.q_ann_brute_topk(spark, SF_DIR)) == rows(
        dataops._ann_brute_catalyst(spark, SF_DIR)
    )


def test_ann_brute_topk_matches_numpy(spark):
    got = dataops.q_ann_brute_topk(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").orderBy("vec_id").collect()
    vecs = {r["vec_id"]: np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6 + 0.5).astype(np.int64) for r in emb}
    for probe in range(dataops.N_PROBES):
        mine = [(r["neighbor_id"], r["dot"]) for r in got if r["probe_id"] == probe]
        mine.sort(key=lambda t: (-t[1], t[0]))
        dots = sorted(
            ((nid, int(v @ vecs[probe])) for nid, v in vecs.items() if nid != probe),
            key=lambda t: (-t[1], t[0]),
        )[: dataops.TOPK]
        assert mine == dots, probe


def test_exact_dedup_counts(spark):
    rows = dataops.q_dedup_exact(spark, SF_DIR).collect()
    # expected counts computed independently over the same augmented corpus
    corpus = dataops.augmented_corpus(spark, SF_DIR).toPandas()
    expected = corpus.groupby("text")["doc_id"].transform("size")
    want = dict(zip(corpus["doc_id"], expected))
    got = {r["doc_id"]: r["dup_count"] for r in rows}
    assert got == want
    # and a constructed true duplicate is counted as a group of 2
    df = spark.createDataFrame([(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string")
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5("text"))
    out = df.select("doc_id", F.count("*").over(w).alias("c")).collect()
    assert {r["doc_id"]: r["c"] for r in out} == {1: 2, 2: 2, 3: 1}


def test_multimodal_feature_plumbing(spark):
    from hg64spark import multimodal

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    items = multimodal.items_from_documents(docs)
    feats = multimodal.extract_features(items).collect()
    assert len(feats) == docs.count()
    by_id = {r["item_id"]: r for r in feats}
    one = docs.select("doc_id", "text").first()
    r = by_id[one["doc_id"]]
    assert r["n_bytes"] == len(one["text"].encode())
    assert len(r["feature"]) == multimodal.FEATURE_DIM
    assert all(0.0 <= f <= 1.0 for f in r["feature"])
    # determinism: same payload -> same features
    import pandas as pd

    f1 = multimodal.fake_features(pd.Series([b"abc", b"abc", b"xyz"]))
    assert np.array_equal(f1[0], f1[1]) and not np.array_equal(f1[0], f1[2])


def _have(mod: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(mod) is not None


@pytest.mark.skipif(
    _have("PIL") and _have("soundfile"),
    reason="optional decoders installed; the real branches are tested below",
)
def test_multimodal_heavy_formats_fail_loudly_without_optional_deps():
    """Without the optional Pillow/soundfile, non-native formats still fail
    loudly with NotImplementedError (never a silent fake); the NATIVE
    formats (PPM/WAV) are real codecs tested below."""
    from hg64spark import multimodal

    if not _have("PIL"):
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG...")
    if not _have("soundfile"):
        with pytest.raises(NotImplementedError):
            multimodal.decode_audio(b"OggS....")


@pytest.mark.skipif(not _have("PIL"), reason="Pillow not installed")
def test_decode_image_pillow_branch():
    """With Pillow present, JPEG decodes to the same HxWxC uint8 contract
    as the native PPM path, and a lossless PNG round-trips exactly."""
    import io

    from PIL import Image

    from hg64spark import multimodal as mm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    png = io.BytesIO()
    Image.fromarray(img).save(png, format="PNG")
    out = mm.decode_image(png.getvalue())
    assert out.shape == (24, 32, 3) and out.dtype == np.uint8
    assert np.array_equal(out, img)  # PNG is lossless
    jpg = io.BytesIO()
    Image.fromarray(img).save(jpg, format="JPEG", quality=90)
    jout = mm.decode_image(jpg.getvalue())
    assert jout.shape == (24, 32, 3) and jout.dtype == np.uint8
    # grayscale keeps a single channel
    gpng = io.BytesIO()
    Image.fromarray(img[:, :, 0]).save(gpng, format="PNG")
    gout = mm.decode_image(gpng.getvalue())
    assert gout.shape == (24, 32, 1)


@pytest.mark.skipif(not _have("soundfile"), reason="soundfile not installed")
def test_decode_audio_soundfile_branch():
    """With soundfile present, FLAC decodes to the same
    (rate, int16 [frames, channels]) contract as the native WAV path —
    and FLAC being lossless, to the identical samples."""
    import io

    import soundfile as sf

    from hg64spark import multimodal as mm

    rng = np.random.default_rng(11)
    wave = rng.integers(-(2**14), 2**14, size=(800, 2), dtype=np.int16)
    buf = io.BytesIO()
    sf.write(buf, wave, 8000, format="FLAC")
    rate, out = mm.decode_audio(buf.getvalue())
    assert rate == 8000 and out.dtype == np.int16
    assert np.array_equal(out, wave)


def test_ppm_codec_roundtrip_and_grammar():
    import numpy as np

    from hg64spark import multimodal as mm

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (16, 2)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = mm.decode_ppm(mm.encode_ppm(img))
        assert out.shape == (h, w, 3) and (out == img).all()
    # dispatcher routes P6 natively
    img = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    assert (mm.decode_image(mm.encode_ppm(img)) == img).all()
    # full header grammar: comments between tokens, arbitrary whitespace
    raster = bytes(range(2 * 2 * 3))
    fancy = b"P6 # comment\n# another\n 2\t2 # sizes\n255\n" + raster
    assert (mm.decode_ppm(fancy).reshape(-1) == np.frombuffer(raster, np.uint8)).all()
    # corruption: ValueError, never IndexError/struct.error
    good = mm.encode_ppm(img)
    for bad in [b"", b"P5\n1 1\n255\nxxx", good[:-1], b"P6\n2 2\n255", b"P6\n2 2\n65535\n" + raster]:
        with pytest.raises(ValueError):
            mm.decode_ppm(bad)


def test_wav_codec_roundtrip_chunks_and_stereo():
    import struct

    import numpy as np

    from hg64spark import multimodal as mm

    mono = (np.arange(100, dtype=np.int16) * 37) % 2048 - 1024
    rate, out = mm.decode_wav(mm.encode_wav(mono, 8000))
    assert rate == 8000 and out.shape == (100, 1) and (out[:, 0] == mono).all()
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    rate, out = mm.decode_wav(mm.encode_wav(stereo, 44100))
    assert rate == 44100 and out.shape == (100, 2) and (out == stereo).all()
    # RIFF chunk-walking: an extra ODD-SIZED chunk before fmt/data must be
    # skipped with word alignment (the spec's pad byte)
    buf = mm.encode_wav(mono, 16000)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    patched = buf[:12] + extra + buf[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, out = mm.decode_wav(patched)
    assert rate == 16000 and (out[:, 0] == mono).all()
    # dispatcher routes RIFF natively
    assert mm.decode_audio(buf)[0] == 16000
    # corruption: ValueError
    for bad in [b"", b"RIFF....", buf[:-3], buf[:12]]:
        with pytest.raises(ValueError):
            mm.decode_wav(bad)
    # non-PCM format tag rejected
    tag_pos = buf.index(b"fmt ") + 8
    nonpcm = buf[:tag_pos] + struct.pack("<H", 3) + buf[tag_pos + 2 :]
    with pytest.raises(ValueError):
        mm.decode_wav(nonpcm)
    # contract: CORRUPT input is ValueError, never struct.error or
    # ZeroDivisionError — 0-channel fmt and an undersized fmt chunk both
    # pass the generic length checks (code-review findings)
    ch_pos = buf.index(b"fmt ") + 8 + 2
    zero_ch = buf[:ch_pos] + struct.pack("<H", 0) + buf[ch_pos + 2 :]
    with pytest.raises(ValueError, match="0 channels"):
        mm.decode_wav(zero_ch)
    fmt_at = buf.index(b"fmt ")
    short_fmt = (
        buf[:12]
        + b"fmt "
        + struct.pack("<I", 4)
        + buf[fmt_at + 8 : fmt_at + 12]
        + buf[fmt_at + 8 + 16 :]  # rest of original stream incl. data chunk
    )
    short_fmt = b"RIFF" + struct.pack("<I", len(short_fmt) - 8) + short_fmt[8:]
    with pytest.raises(ValueError, match="fmt chunk too short"):
        mm.decode_wav(short_fmt)


def test_synth_stats_match_closed_form():
    """The synthesized payload builders agree with the closed-form stats the
    oracles predict — pinned here so a synthesis change that silently
    diverges from the SQL constants fails in unit tests, not just at the
    driver gate."""
    import numpy as np

    from hg64spark import multimodal as mm

    for d in [0, 1, 7, 49, 123456]:
        img = mm.synth_image(d)
        assert img.shape == (d % 3 + 2, d % 5 + 2, 3)
        n = img.size
        assert int(img.astype(np.int64).sum()) == sum((d * 31 + i) % 256 for i in range(n))
        rate, wave = mm.synth_audio(d)
        assert rate == 8000 + (d % 3) * 4000 and wave.shape == (d % 50 + 10,)
        assert int(np.abs(wave.astype(np.int64)).sum()) == sum(
            abs((d * 7 + i * 13) % 2048 - 1024) for i in range(d % 50 + 10)
        )


def test_langid_is_deterministic_and_total(spark):
    rows = dataops.q_text_langid(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs
    assert all(r["predicted_lang"] in ("en", "es", "de", "fr", "zh", "und") for r in rows)


def test_simhash_plan_has_no_cartesian_or_bnlj(spark):
    """The SimHash pair search must be the banded equi-join, never a
    theta-join: a CartesianProduct / BroadcastNestedLoopJoin in this plan is
    an O(n^2) scale-killer at 10^9 docs (VERDICT r1 'What's wrong' #1)."""
    plan = dataops.q_dedup_simhash(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_minhash_plan_shuffles_hashed_keys_not_strings(spark):
    """Regression guard for the round-3 rework: every exchange in the
    MinHash plan must carry 8-byte hashed shingle keys — a raw shingle
    STRING reappearing in an Exchange's partitioning means the verification
    joins regressed to shuffling ~5-word text keys (~5x the bytes at 100 TB).
    The string column `sh` may only exist below the hashing projection,
    never as a partitioning key."""
    import re

    plan = dataops.q_dedup_minhash_lsh(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    # scan whole Exchange lines (a `[^)]*` capture would truncate at the
    # first nested ')' and could let an sh# key after a nested expression
    # slip through); an Exchange line mentions only its partitioning keys
    exchange_lines = [ln for ln in plan.splitlines() if "hashpartitioning" in ln]
    assert exchange_lines, plan  # the joins must actually exchange something
    for ln in exchange_lines:
        assert not re.search(r"\bsh#\d+", ln), f"string shingle key in exchange: {ln}"


def test_simhash_banding_is_lossless(spark):
    """Pigeonhole guarantee: banded candidates recover EXACTLY the pairs an
    exhaustive Hamming<=8 scan finds (banding changes the plan, not the
    answer)."""
    sf = SF_DIR
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dataops.q_dedup_simhash(spark, sf).collect()
    }
    # exhaustive scan over the same signatures, driver-side (test scale only)
    c = dataops.augmented_corpus(spark, sf)
    toks = c.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = toks.select("doc_id", dataops._tokhash_spark(F.col("tok")).alias("h"))
    bits = h.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {dataops.SIMHASH_BITS - 1}),"
                f" b -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)"
            )
        ).alias("b", "sign"),
    )
    sums = bits.groupBy("doc_id", "b").agg(F.sum("sign").alias("s"))
    sigs = sums.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(1L, b)")).otherwise(F.lit(0))).alias("sig")
    )
    rows = sigs.collect()
    exhaustive = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            x, y = (a, b) if a["doc_id"] < b["doc_id"] else (b, a)
            d = bin(x["sig"] ^ y["sig"]).count("1")
            if d <= dataops.HAMMING_MAX:
                exhaustive.add((x["doc_id"], y["doc_id"], d))
    assert banded == exhaustive


def test_hot_shingle_df_cap_bounds_the_join(spark):
    """A planted stop-phrase shingle shared by every doc must NOT reach the
    pair self-join: with the DF cap the join output stays linear in the
    number of genuinely-similar pairs instead of exploding quadratically."""
    n = 300  # > SHINGLE_DF_CAP
    stop = "the quick brown fox jumps"  # one shared 5-gram in every doc
    rows = [(i, f"{stop} unique{i} u{i}a u{i}b u{i}c u{i}d") for i in range(n)]
    # plus one genuine near-dup pair sharing rare shingles
    rows += [
        (10_000, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (10_001, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dataops.capped_shingles(corpus)
    hot = capped.filter(F.col("sh") == stop).count()
    assert hot == 0, "ultra-common shingle must be dropped by the DF cap"

    pairs = dataops.jaccard_pairs(corpus).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # without the cap this would contain ~n^2/2 stop-phrase pairs
    assert (10_000, 10_001) in got
    assert all(a >= 10_000 for a, _ in got), f"stop-phrase pairs leaked: {sorted(got)[:5]}"


def test_embedding_cosine_dedup_finds_exactly_planted_pairs(spark):
    """Every planted embedding near-dup (vec, vec+PLANT_OFFSET) is found, nothing
    else clears tau=0.9 (max natural cosine ~0.51), and the candidate plan is
    the banded equi-join (no cartesian/BNLJ)."""
    df = dataops.q_dedup_embedding_cosine(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    rows = df.collect()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    pairs = {(r["vec_a"], r["vec_b"]) for r in rows}
    assert pairs == {(i, i + dataops.PLANT_OFFSET) for i in range(n_vecs)}


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing's published guarantee: two documents sharing a token run of
    length >= k + W - 1 share at least one fingerprint."""
    import pyspark.sql.functions as FF

    k, w = dataops.SHINGLE_K, dataops.WINNOW_W
    run = " ".join(f"shared{i}" for i in range(k + w - 1))
    rows = [
        (1, f"prefix one two three {run} tail1 tail2 tail3 tail4"),
        (2, f"{run} completely different suffix here okay fine"),
        (3, "nothing in common with the others at all whatsoever truly"),
    ]
    # build fingerprints over a constructed corpus via the same expressions
    import hg64spark.dataops as dd

    d = spark.createDataFrame(rows, "doc_id long, text string")
    toks = FF.split(FF.col("text"), " ")
    sh = d.filter(FF.size(toks) >= k).select(
        "doc_id",
        FF.posexplode(
            FF.expr(
                f"transform(sequence(1, size(split(text,' ')) - {k - 1}),"
                f" i -> array_join(slice(split(text,' '), i, {k}), ' '))"
            )
        ).alias("pos", "sh"),
    )
    h = sh.select("doc_id", "pos", dd._tokhash_spark(FF.col("sh")).alias("h"))
    from pyspark.sql import Window as W

    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    wm = h.select("doc_id", FF.min("h").over(win).alias("fp"), FF.count("*").over(win).alias("cnt"))
    fps = wm.filter(FF.col("cnt") == w).select("doc_id", "fp").distinct().collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared run must share >= 1 fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_multimodal_resize_and_frame_sample_plumbing(spark):
    from hg64spark import multimodal

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    items = multimodal.items_from_documents(docs)

    resized = multimodal.resize_items(items, height=8, width=8).collect()
    assert len(resized) == docs.count()
    assert all(len(r["payload"]) == 64 and r["out_h"] == 8 and r["out_w"] == 8 for r in resized)
    # deterministic: same payload -> same resized bytes
    assert multimodal.fake_resize(b"hello world" * 10, 8, 8) == multimodal.fake_resize(b"hello world" * 10, 8, 8)

    frames = multimodal.sample_frames(items, every_n=3).collect()
    one = docs.select("doc_id", "text").first()
    raw = one["text"].encode()
    n_frames = max(1, (len(raw) + multimodal.FRAME_BYTES - 1) // multimodal.FRAME_BYTES)
    mine = sorted((r["frame_idx"], bytes(r["frame"])) for r in frames if r["item_id"] == one["doc_id"])
    want = sorted(
        (f, raw[f * multimodal.FRAME_BYTES : (f + 1) * multimodal.FRAME_BYTES])
        for f in range(0, n_frames, 3)
    )
    assert mine == want
    # every item contributes at least one frame
    assert {r["item_id"] for r in frames} == {r["item_id"] for r in items.select("item_id").collect()}


def test_decontaminate_neardup_finds_planted_probe_copies(spark):
    """The planted truncated copy of every probe doc must be flagged as
    near-dup contamination of its source probe with jaccard >= tau, probe
    docs themselves never appear as contaminated, and every reported pair
    meets the threshold."""
    out = dataops.q_decontaminate_neardup(spark, SF_DIR).collect()
    assert out, "no contamination found — the planted copies guarantee some"
    for r in out:
        assert r["doc_id"] >= dataops.DECON_PROBE_DOCS
        assert r["probe_id"] < dataops.DECON_PROBE_DOCS
        assert r["jaccard"] >= dataops.DECON_NEARDUP_TAU
    flagged = {(r["probe_id"], r["doc_id"]) for r in out}
    for p in range(dataops.DECON_PROBE_DOCS):
        assert (p, p + dataops.PLANT_OFFSET) in flagged, f"planted copy of probe {p} missed"


def test_pack_token_shards_exact_and_partitioning_invariant(spark):
    """Shard assignment must equal the single-threaded greedy reference
    (md5 order, start-offset rule) exactly, be invariant under input
    partitioning (the two-level prefix sum is where that could break), and
    keep every shard within budget + one straddling document."""
    import hashlib

    rows = [(i, " ".join(["w"] * ((i * 37) % 400 + 1))) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 1000
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in dataops.pack_token_shards(docs, budget=budget).collect()
    }
    got_rep = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in dataops.pack_token_shards(docs.repartition(7), budget=budget).collect()
    }
    assert got == got_rep
    # single-threaded greedy reference
    order = sorted(rows, key=lambda t: (hashlib.md5(str(t[0]).encode()).hexdigest(), t[0]))
    cum, want = 0, {}
    for doc_id, text in order:
        n = len(text.split(" "))
        want[doc_id] = (n, cum // budget)
        cum += n
    assert got == want
    # overflow rule: a shard holds at most budget + (its last doc) tokens
    per_shard = {}
    for n, s in got.values():
        per_shard.setdefault(s, []).append(n)
    for s, ns in per_shard.items():
        assert sum(ns) <= budget + max(ns), (s, sum(ns))


def test_text_novelty_semantics(spark):
    """A doc whose grams exist nowhere else scores exactly 1.0; two
    identical docs zero each other out; a half-copied doc lands strictly
    between; sub-k docs emit no row."""
    uniq = " ".join(f"u{i}" for i in range(20))
    boil = " ".join(f"b{i}" for i in range(20))
    half = " ".join(f"b{i}" for i in range(10)) + " " + " ".join(f"h{i}" for i in range(10))
    rows = [(1, uniq), (2, boil), (3, boil), (4, half), (5, "too short")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dataops.text_novelty(docs).collect()}
    assert set(out) == {1, 2, 3, 4}  # doc 5 has no 5-grams
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0 and out[3]["novelty"] == 0.0
    assert 0.0 < out[4]["novelty"] < 1.0
    assert out[1]["n_grams"] == 16 and out[1]["n_novel"] == 16


def test_curriculum_bins_corpus_never_shuffles(spark):
    """The corpus branch of the curriculum plan must flow FileScan ->
    Filter -> Project -> broadcast join with NO Exchange (the whole point:
    sketch thresholds come to the data, the data never moves), and the
    NULL/text filters must reach the parquet scan."""
    plan = (
        dataops.q_curriculum_bins(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    corpus_branch = plan.split("BroadcastExchange")[0]
    assert "Exchange" not in corpus_branch, plan
    assert "PushedFilters: [IsNotNull(text), IsNotNull(doc_id)]" in plan, plan


def test_curriculum_bins_semantics(spark):
    """Bins are monotone in n_tokens, cover all len(qs)+1 grades at gate
    scale, and every document (with text + id) is graded exactly once."""
    rows = dataops.q_curriculum_bins(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expect = docs.filter("text IS NOT NULL AND doc_id IS NOT NULL").count()
    assert len(rows) == expect
    assert len({r["doc_id"] for r in rows}) == expect
    by_tok = sorted(rows, key=lambda r: r["n_tokens"])
    bins = [r["bin"] for r in by_tok]
    assert bins == sorted(bins), "bin must be monotone in n_tokens"
    assert set(bins) == {0, 1, 2, 3}


def test_pack_token_shards_excludes_null_doc_ids(spark):
    """NULL doc_id rows must be excluded ENTIRELY — md5(NULL) is NULL, so
    without the filter the null-unsafe bucket join drops the row from the
    output while its tokens still inflate the offset table, shifting every
    later doc's shard id (and Spark/DuckDB order NULLs oppositely).  The
    assignment with a NULL row present must equal the assignment with it
    pre-removed."""
    rows = [(str(i), " ".join(["w"] * ((i * 37) % 400 + 1))) for i in range(100)]
    clean = spark.createDataFrame(rows, "doc_id string, text string")
    dirty = clean.unionAll(
        spark.createDataFrame([(None, "x " * 5000)], "doc_id string, text string")
    )
    want = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in dataops.pack_token_shards(clean, budget=1000).collect()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in dataops.pack_token_shards(dirty, budget=1000).collect()
    }
    assert got == want and None not in got


def test_pack_token_shards_plan_is_two_level_prefix_sum(spark):
    """The packing plan's ONLY single-partition exchange must feed the
    256-row bucket-totals window — the data itself flows through
    hashpartitioning windows.  A global data window would show a second
    SinglePartition exchange (or one whose immediate child is not the
    totals aggregate)."""
    import re

    plan = (
        dataops.pack_token_shards(dataops._docs(spark, SF_DIR))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange SinglePartition") == 1, plan
    seg = plan.split("Exchange SinglePartition", 1)[1]
    first_node = re.search(r"\+- (\w+)", seg)
    assert first_node and first_node.group(1) == "HashAggregate", plan
    # the per-bucket data window rides a hash partitioning
    assert "Exchange hashpartitioning" in plan, plan


def test_decontaminate_neardup_plan_broadcasts_only(spark):
    """Every join in the near-dup decontamination plan must be broadcast
    (the probe side is tiny by definition); a SortMerge/shuffled join or a
    cartesian would mean the corpus got shuffled against the probes.  And
    every hashpartitioning Exchange must sit ABOVE a broadcast join — i.e.
    only already-pruned / post-join streams get shuffled, never the raw
    corpus shingle stream (the prune-before-distinct discipline): a
    pre-prune distinct would show an Exchange whose subtree is just
    Generate/Scan with no join below it."""
    import re

    def node_depth(line):
        m = re.search(r"[A-Za-z]", line)
        return m.start() if m else None

    for q in (dataops.q_decontaminate_neardup, dataops.q_decontaminate_neardup_bloom):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        for bad in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
                    "BroadcastNestedLoopJoin"):
            assert bad not in plan, (q.__name__, bad, plan)
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange hashpartitioning" not in line:
                continue
            d = node_depth(line)
            subtree = []
            for nxt in lines[i + 1:]:
                nd = node_depth(nxt)
                if nd is not None and nd <= d:
                    break
                subtree.append(nxt)
            # a subtree with no join below may only be a PROBE-side build:
            # probe shingle distincts (probe_id, hh) or the Bloom words
            # aggregation (word_idx, <= n_bits/64 rows) — tiny by
            # definition.  Any doc_id-keyed exchange must be above a
            # broadcast join, i.e. of an already-pruned corpus stream.
            if any("BroadcastHashJoin" in s for s in subtree):
                continue
            col = r"(probe_id#\d+L?|hh#\d+L?|word_idx#\d+L?)"
            assert re.search(rf"hashpartitioning\({col}(, {col})*,", line), (
                q.__name__, "un-pruned corpus stream exchanged", line, plan
            )


def test_chunk_documents_semantics_and_zero_exchange(spark):
    """Chunks must tile each doc with the declared stride/width (clipped
    tails), reassemble to the original text via the stride-aligned pieces,
    and the plan must contain NO Exchange (chunking is embarrassingly
    parallel)."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(150))), (2, "a b c")],
        "doc_id long, text string",
    )
    out = dataops.chunk_documents(docs, chunk_tokens=64, stride=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
           for r in out.collect()}
    toks = [f"t{i}" for i in range(150)]
    # doc 1: starts 0,32,64,96 -> 4 chunks; chunk 3 (tokens 97-150) reaches
    # the end, so NO chunk 4 — a start at 128 would be a strict sub-window
    # of chunk 3 adding no new context
    assert sorted(i for (d, i) in got if d == 1) == [0, 1, 2, 3]
    for i in range(4):
        piece = toks[i * 32 : i * 32 + 64]
        assert got[(1, i)] == (" ".join(piece), len(piece)), i
    # doc 2 (3 tokens < stride): exactly one whole chunk
    assert got[(2, 0)] == ("a b c", 3) and (2, 1) not in got
    # every token of doc 1 is covered by some chunk
    covered = set()
    for i in range(4):
        covered |= set(range(i * 32, min(i * 32 + 64, 150)))
    assert covered == set(range(150))
    # gapped sampling (stride > chunk): starts stay inside the doc — no
    # empty trailing chunks
    gap = {(r["doc_id"], r["chunk_idx"]): r["n_chunk_tokens"]
           for r in dataops.chunk_documents(docs, chunk_tokens=10, stride=100).collect()}
    assert {i for (d, i) in gap if d == 1} == {0, 1} and gap[(1, 1)] == 10
    with pytest.raises(ValueError, match="positive"):
        dataops.chunk_documents(docs, chunk_tokens=0)


def test_sample_fixed_k_matches_naive_rank_and_caps_small_groups(spark):
    """The PRODUCTION sampler (sample_fixed_k, the body of the driver
    gate) must equal the naive per-group md5 rank exactly: K rows for big
    groups, and a genuinely-smaller-than-K group ("tiny", 10 members)
    returned whole."""
    import hashlib

    def lang_of(i):
        return "tiny" if i % 40 == 0 else ("big" if i % 3 else "small")

    rows = [(i, lang_of(i)) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    got = dataops.sample_fixed_k(docs, k=50).collect()
    by_lang = {}
    for doc_id, lang in rows:
        by_lang.setdefault(lang, []).append(doc_id)
    want = set()
    for lang, ids in by_lang.items():
        ranked = sorted(ids, key=lambda x: (hashlib.md5(str(x).encode()).hexdigest(), x))
        want |= {(lang, x) for x in ranked[:50]}
    assert {(r["lang"], r["doc_id"]) for r in got} == want
    n_tiny = sum(1 for r in got if r["lang"] == "tiny")
    assert len(by_lang["tiny"]) == 10 and n_tiny == 10  # whole group, < K


def test_rotated_out_twins_equal_in_window_siblings(spark):
    """The twin implementations (cluster min-label vs star contraction;
    decontaminate broadcast-probe vs Bloom-pruned) take turns in the
    driver's 50-row correctness window across rounds — this asserts their
    equivalence directly (not just a shared oracle string) so a regression
    in whichever form is currently rotated out cannot hide behind its
    sibling's green row."""
    a = {tuple(r) for r in dataops.q_dedup_cluster(spark, SF_DIR).collect()}
    b = {tuple(r) for r in dataops.q_dedup_cluster_star(spark, SF_DIR).collect()}
    assert a == b and a
    c = {tuple(r) for r in dataops.q_decontaminate_overlap(spark, SF_DIR).collect()}
    d = {tuple(r) for r in dataops.q_decontaminate_bloom(spark, SF_DIR).collect()}
    assert c == d and c


def test_scrub_pii_plan_is_shuffle_free(spark):
    """The scrub pass is pure per-row regexp Catalyst — any Exchange means
    it stopped being embarrassingly parallel, which is the property that
    makes it runnable as a pre-pass over a 100 TB corpus."""
    plan = dataops.q_scrub_pii(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_scrub_pii_counts_and_redaction(spark):
    """Planted payloads must be counted AND gone from the cleaned text;
    unplanted docs must be untouched (count 0, no marker)."""
    rows = {r["doc_id"]: r for r in dataops.q_scrub_pii(spark, SF_DIR).collect()}
    assert rows
    for did, r in rows.items():
        if r["clean"] is None:
            continue
        assert (r["n_url"] >= 1) == (did % 7 == 0), r
        assert (r["n_email"] >= 1) == (did % 11 == 0), r
        assert (r["n_idnum"] >= 1) == (did % 13 == 0), r
        assert ("<URL>" in r["clean"]) == (did % 7 == 0), r
        assert ("<EMAIL>" in r["clean"]) == (did % 11 == 0), r
        assert ("<ID>" in r["clean"]) == (did % 13 == 0), r
        assert "@" not in r["clean"].replace("<EMAIL>", ""), r
        assert "https://" not in r["clean"].replace("<URL>", ""), r


def test_decayed_topk_users_matches_naive(spark):
    """The salted two-phase top-k + integer halving weights must equal a
    naive driver-side recomputation from the raw events (weights 2^(H-age),
    zero beyond the horizon; ties broken by user_id asc)."""
    from hg64spark import io as hio

    from datetime import timedelta

    ev = hio.read_table(spark, SF_DIR, "events").collect()
    mx = max(r["ts"] for r in ev if r["ts"] is not None)
    per = {}
    for r in ev:
        # NULL ts contributes weight 0 in both engines (CASE on NULL age
        # falls to ELSE 0); NULL user_id is excluded by the operator
        if r["user_id"] is None or r["ts"] is None:
            continue
        # exact integer microseconds (timedelta floor-div) — a float
        # total_seconds() round-trip can land a bucket-boundary event one
        # bucket younger than Spark's integer timestampdiff DIV
        age = ((mx - r["ts"]) // timedelta(microseconds=1)) // dataops.DECAY_BUCKET_US
        w = (1 << (dataops.DECAY_HORIZON - age)) if age <= dataops.DECAY_HORIZON else 0
        per[r["user_id"]] = per.get(r["user_id"], 0) + w
    want = sorted(
        ((u, c) for u, c in per.items() if c > 0), key=lambda t: (-t[1], t[0])
    )[: dataops.DECAY_TOPK]
    got = [
        (r["user_id"], r["decayed"])
        for r in dataops.q_decayed_topk_users(spark, SF_DIR)
        .orderBy(F.desc("decayed"), F.asc("user_id"))
        .collect()
    ]
    assert got == want


def test_corpus_diff_planted_statuses(spark):
    """The diff gate's derived snapshot plants every status class from
    doc_id arithmetic; the operator must recover exactly that set, and
    unchanged docs must emit no row."""
    base = [
        r["doc_id"]
        for r in dataops._docs(spark, SF_DIR).select("doc_id").collect()
        if r["doc_id"] is not None
    ]
    want = {}
    for d in base:
        if d % 5 == 0:
            want[d] = "removed"
        elif d % 3 == 0:
            want[d] = "changed"
        if d % 4 == 0:
            want[d + dataops.PLANT_OFFSET] = "added"
    got = {r["doc_id"]: r["status"] for r in dataops.q_corpus_diff(spark, SF_DIR).collect()}
    assert got == want


def test_znorm_row_side_is_broadcast_not_shuffled(spark):
    """Stats must reach the rows by broadcast: the data side of the
    normalization join shows no hashpartitioning Exchange (the property
    that makes this a free pass over 100 TB), and the z formula must equal
    the single-division python recomputation exactly."""
    import math

    out = dataops.q_znorm_lineitem(spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    streamed = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in streamed, plan

    from hg64spark import io as hio

    li = hio.read_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    ).collect()
    stats = {}
    for r in li:
        k = (r["l_returnflag"], r["l_linestatus"])
        v = int(r["l_quantity"])
        n, s, ss = stats.get(k, (0, 0, 0))
        stats[k] = (n + 1, s + v, ss + v * v)
    for r in out.collect():
        n, s, ss = stats[(r["l_returnflag"], r["l_linestatus"])]
        den = n * ss - s * s
        want = None if den == 0 else float(r["v"] * n - s) / math.sqrt(float(den))
        assert r["z"] == want, (r, want)


def test_normalize_per_group_keeps_null_groups(spark):
    """A NULL group key is a group like any other: its rows must come back
    normalized against the NULL group's own stats, not silently dropped by
    a null-rejecting join."""
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, None, 5), (4, None, 15)],
        "id long, g string, val long",
    )
    out = dataops.normalize_per_group(df, ["g"], "val", ["id"]).collect()
    assert len(out) == 4
    nulls = {r["id"]: r["z"] for r in out if r["g"] is None}
    assert set(nulls) == {3, 4}
    # two-point group: z = (v*2 - s)/sqrt(2*ss - s*s) = ±5/sqrt(50)
    import math

    assert nulls[3] == (5 * 2 - 20) / math.sqrt(2 * 250 - 400)
    assert nulls[4] == (15 * 2 - 20) / math.sqrt(2 * 250 - 400)


def test_corpus_diff_plan_projects_hash_before_join(spark):
    """Scale claim in corpus_diff's docstring: both snapshots project down
    to (doc_id, 16-char md5 prefix) BEFORE the full-outer join, so the
    shuffle carries ~25 bytes/row, never the documents.  A `text#N` column
    appearing in any Exchange line means the projection slid above the
    join and the shuffle regressed to moving full document bodies."""
    import re

    plan = (
        dataops.q_corpus_diff(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exchange_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchange_lines, plan  # the full-outer join must exchange
    for ln in exchange_lines:
        assert not re.search(r"\btext#\d+", ln), f"document body in exchange: {ln}"


def test_calibrate_plan_broadcasts_reference_row_side_never_shuffles(spark):
    """hg64_calibrate's scale claim: the reference collapses to a <= 1920-row
    cumulative table that is BROADCAST onto the incoming rows — the row side
    itself must show zero hash-partitioning Exchange (the only aggregate
    shuffle lives inside the broadcast's build subtree)."""
    plan = (
        dataops.q_calibrate_new_docs(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan, plan
    streamed = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in streamed, plan


def test_znorm_plan_broadcasts_stats_row_side_never_shuffles(spark):
    """normalize_per_group's scale claim: per-group (n, s, ss) stats join
    back by BROADCAST, so the data rows are never shuffled to be
    normalized — only the bounded stats aggregate exchanges."""
    plan = (
        dataops.q_znorm_lineitem(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan, plan
    streamed = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in streamed, plan


def test_calibrate_empty_reference_yields_null_pct(spark):
    """An EMPTY reference corpus still densifies to 1920 zero-count buckets
    with __pop = 0: every incoming row must come back with rank 0 and a
    NULL percentile — not an ANSI DIVIDE_BY_ZERO crash (ADVICE r6)."""
    from hg64spark import relational

    rows = spark.createDataFrame([(1, 10), (2, 999)], "id long, v long")
    empty_ref = spark.createDataFrame([], "id long, v long")
    out = relational.hg64_calibrate(rows, "v", empty_ref, "v", 5).collect()
    assert len(out) == 2
    for r in out:
        assert r["ref_rank"] == 0
        assert r["ref_pct"] is None


def test_corpus_minhash_sim_estimates_group_jaccard(spark):
    """Estimator sanity on constructed groups: identical corpora match on
    every signature component (est = 1.0), disjoint ones on ~none, and a
    half-overlapping pair lands within the 64-perm standard error of its
    true hashed-shingle Jaccard.  Plan stays equi-join (no cartesian)."""
    mk = lambda base, n: " ".join(f"{base}{i}" for i in range(n))  # noqa: E731
    rows = [
        (1, mk("a", 40), "s1"),
        (2, mk("a", 40), "s2"),          # identical to s1
        (3, mk("z", 40), "s3"),          # disjoint from everything
        # s4 = first 25 of s1's tokens + 15 fresh -> overlapping shingles
        (4, mk("a", 25) + " " + mk("q", 15), "s4"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df = dataops.corpus_minhash_sim(corpus, "source")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    est = {(r["g_a"], r["g_b"]): r for r in df.collect()}
    assert est[("s1", "s2")]["matches"] == dataops.MHSIM_N
    assert est[("s1", "s2")]["jaccard_est"] == 1.0
    assert est[("s1", "s3")]["jaccard_est"] <= 0.1
    # true Jaccard over hashed 5-gram shingles of s1 vs s4: s4 shares the
    # 21 shingles fully inside its first 25 tokens out of 36 each ->
    # J = 21 / (36 + 36 - 21) = 21/51 ~ 0.412; 3 sigma at 64 perms ~ 0.185
    j = est[("s1", "s4")]["jaccard_est"]
    assert abs(j - 21 / 51) <= 0.185, j


def test_sample_to_mixture_hits_target_and_keeps_bottleneck(spark):
    """The rebalanced mixture: the bottleneck group (least data relative to
    target) survives in FULL, other groups land within sampling noise of
    their proportional share, and out-of-target groups vanish."""
    import pyspark.sql.functions as FF

    rows = (
        [(i, "a") for i in range(4000)]
        + [(10_000 + i, "b") for i in range(4000)]
        + [(20_000 + i, "c") for i in range(500)]   # bottleneck at 4:2:1
        + [(30_000 + i, "x") for i in range(100)]   # not in target
    )
    corpus = spark.createDataFrame(rows, "doc_id long, lang string")
    out = dataops.sample_to_mixture(corpus, "lang", {"a": 4, "b": 2, "c": 1})
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(FF.count("*").alias("n")).collect()}
    assert "x" not in kept
    # c is the bottleneck: 500/1 < 4000/2 < 4000/4 -> kept whole
    assert kept["c"] == 500
    # expected a = 4*500 = 2000 of 4000 (rate .5), b = 2*500 = 1000 of 4000
    # (rate .25); 5 sigma of Binomial(4000, r) ~ 5*sqrt(4000*r*(1-r))
    assert abs(kept["a"] - 2000) <= 5 * (4000 * 0.25) ** 0.5 * 2
    assert abs(kept["b"] - 1000) <= 5 * (4000 * 0.25 * 0.75) ** 0.5
    # deterministic: a second run returns the identical set
    again = dataops.sample_to_mixture(corpus, "lang", {"a": 4, "b": 2, "c": 1})
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_sample_mixture_plan_row_side_never_shuffles(spark):
    """Scale claim: thresholds derive from the tiny per-group counts frame
    and broadcast back — the kept-row side is scan -> broadcast join ->
    filter with zero hash-partitioning Exchange."""
    plan = (
        dataops.q_sample_mixture_langs(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan, plan
    streamed = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in streamed, plan


def test_sample_to_mixture_validates_target(spark):
    corpus = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        dataops.sample_to_mixture(corpus, "lang", {})
    with pytest.raises(ValueError):
        dataops.sample_to_mixture(corpus, "lang", {"a": 0})
    with pytest.raises(ValueError):
        dataops.sample_to_mixture(corpus, "lang", {"a": -1.0})
    with pytest.raises(ValueError):
        dataops.sample_to_mixture(corpus, "lang", {None: 1.0})


def test_ref_coverage_scores_copies_edits_and_fresh(spark):
    """Coverage semantics on constructed docs: an exact copy of reference
    content scores 1.0, wholly fresh content 0.0, and a half-borrowed doc
    strictly between; sub-k-token docs emit no row."""
    k = dataops.SHINGLE_K
    ref_text = " ".join(f"r{i}" for i in range(30))
    ref = spark.createDataFrame([(1, ref_text)], "doc_id long, text string")
    probes = spark.createDataFrame(
        [
            (10, ref_text),                                        # copy
            (11, " ".join(f"f{i}" for i in range(30))),            # fresh
            (12, " ".join(f"r{i}" for i in range(15)) + " "        # half
                 + " ".join(f"g{i}" for i in range(15))),
            (13, "too short"),                                     # < k tokens
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dataops.ref_coverage(probes, ref, k).collect()}
    assert out[10]["seen_frac"] == 1.0
    assert out[11]["seen_frac"] == 0.0
    assert 0.0 < out[12]["seen_frac"] < 1.0
    assert 13 not in out
    # counts are over DISTINCT grams
    assert out[10]["n_grams"] == 30 - k + 1 and out[10]["n_seen"] == 30 - k + 1


def test_embedding_centroid_drift_semantics(spark):
    """Planted geometry: a group of copies of another group's vectors has
    centroid cosine 1.0 against it, a negated group -1.0, an orthogonal
    group 0.0, and an all-zero group yields NULL (not a crash)."""
    base = [0.5, 0.25, 0.0, 0.0]
    orth = [0.0, 0.0, 0.5, 0.25]
    rows = (
        [(i, base, 0) for i in range(3)]
        + [(10 + i, base, 1) for i in range(5)]            # copies
        + [(20 + i, [-x for x in base], 2) for i in range(2)]  # negated
        + [(30 + i, orth, 3) for i in range(4)]            # orthogonal
        + [(40 + i, [0.0, 0.0, 0.0, 0.0], 4) for i in range(2)]  # zero
    )
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        (r["g_a"], r["g_b"]): r
        for r in dataops.embedding_centroid_drift(embs, "label").collect()
    }
    import math

    # the final double step (dot / (sqrt*sqrt)) rounds within 1-2 ulp —
    # cross-ENGINE bit-equality holds (pinned op order, gate-asserted),
    # but the mathematical value is approximate
    assert math.isclose(out[(0, 1)]["cos_centroid"], 1.0, rel_tol=1e-12)
    assert math.isclose(out[(0, 2)]["cos_centroid"], -1.0, rel_tol=1e-12)
    assert out[(0, 3)]["cos_centroid"] == 0.0  # dot is exactly 0
    assert out[(0, 4)]["cos_centroid"] is None
    assert out[(0, 1)]["n_a"] == 3 and out[(0, 1)]["n_b"] == 5
    # 5 groups -> 10 pairs, zero group present in all its pairs (as NULL)
    assert len(out) == 10


def test_tfidf_search_ranking_semantics(spark):
    """Quantized tf-idf ranking on a constructed corpus: higher tf of a
    rarer term outranks common-term matches, multi-term matches accumulate,
    and absent query terms contribute nothing."""
    rows = [
        (1, "rare rare rare common filler filler"),
        (2, "rare common common common filler pad"),
        (3, "common filler pad pad pad pad"),
        (4, "nothing relevant here at all ok"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    out = dataops.tfidf_search(corpus, {"q": ["rare", "common", "missing"]}, k=10)
    ranked = [r["doc_id"] for r in out.orderBy("query_id", F.desc("score"), "doc_id").collect()]
    got = {r["doc_id"]: r for r in out.collect()}
    # doc 4 matches nothing -> absent
    assert 4 not in got and set(got) == {1, 2, 3}
    # idf_q: N=4; rare df=2 -> idf 2*2^20; common df=3 -> (4*2^20)//3
    idf_rare = (4 << 20) // 2
    idf_common = (4 << 20) // 3
    assert got[1]["score"] == 3 * idf_rare + 1 * idf_common
    assert got[2]["score"] == 1 * idf_rare + 3 * idf_common
    assert got[3]["score"] == 1 * idf_common
    assert ranked == [1, 2, 3]
    assert got[1]["n_matched"] == 2 and got[3]["n_matched"] == 1
    with pytest.raises(ValueError):
        dataops.tfidf_search(corpus, {})
    with pytest.raises(ValueError):
        dataops.tfidf_search(corpus, {"q": []})


def test_tfidf_search_filters_tokens_before_aggregating(spark):
    """Scale claim: the query-term semi-join must sit BELOW the tf/df
    aggregates (Catalyst cannot push a join under a groupBy, so the filter
    has to be written there) — every hash-partitioning Exchange in the plan
    then carries only query-matching tokens.  A full-vocabulary aggregate
    would show a scan feeding an Exchange with no broadcast join below it."""
    plan = (
        dataops.q_tfidf_search(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both token streams (tf and df) must show the semi-join with the
    # token EXPLODE as its streamed child — i.e. the filter sits directly
    # on the raw token stream, below every aggregate Exchange
    lines = plan.splitlines()
    semi_idx = [i for i, ln in enumerate(lines) if "LeftSemi" in ln]
    assert len(semi_idx) >= 2, plan
    for i in semi_idx:
        assert "Generate explode" in lines[i + 1], f"semi-join not on the raw token stream:\n{lines[i]}\n{lines[i + 1]}"


def test_minhash_signatures_are_min_mergeable(spark):
    """The retained-state contract: the signature of a union of corpora
    equals the per-(g, i) min-merge of the parts' signature frames — so
    snapshots can be compared without rescanning."""
    import pyspark.sql.functions as FF

    mk = lambda base, n: " ".join(f"{base}{i}" for i in range(n))  # noqa: E731
    part1 = spark.createDataFrame(
        [(1, mk("a", 20), "s1"), (2, mk("b", 20), "s2")],
        "doc_id long, text string, source string",
    )
    part2 = spark.createDataFrame(
        [(3, mk("c", 20), "s1"), (4, mk("d", 20), "s2")],
        "doc_id long, text string, source string",
    )
    h = lambda df: dataops.raw_shingles(  # noqa: E731
        df.select(F.col("source").alias("doc_id"), "text")
    ).select(
        F.col("doc_id").alias("g"), dataops._tokhash_spark(F.col("sh")).alias("hh")
    )
    union_sig = dataops.corpus_minhash_signatures(h(part1.unionByName(part2)))
    merged = (
        dataops.corpus_minhash_signatures(h(part1))
        .unionByName(dataops.corpus_minhash_signatures(h(part2)))
        .groupBy("g", "i")
        .agg(FF.min("m").alias("m"))
    )
    key = lambda rows: sorted((r["g"], r["i"], r["m"]) for r in rows)  # noqa: E731
    assert key(union_sig.collect()) == key(merged.collect())
    # and similarity from merged sigs equals the direct operator
    direct = dataops.corpus_minhash_sim(part1.unionByName(part2), "source").collect()
    via_sigs = dataops.corpus_minhash_sim_from_sigs(merged).collect()
    pair = lambda rows: sorted(  # noqa: E731
        (r["g_a"], r["g_b"], r["matches"]) for r in rows
    )
    assert pair(direct) == pair(via_sigs)


def test_sample_to_mixture_weighted_targets_token_shares(spark):
    """weight_col: group mass is sum(tokens), so a group with few long
    docs and one with many short docs can swap bottleneck roles vs the
    unweighted form; zero-mass and non-integral weights are handled."""
    import pyspark.sql.functions as FF

    rows = (
        # group a: 100 docs x 1000 tokens = 100k token mass
        [(i, "a", 1000) for i in range(100)]
        # group b: 1000 docs x 10 tokens = 10k token mass
        + [(1000 + i, "b", 10) for i in range(1000)]
        # group z: rows with NULL weight only -> zero mass -> dropped
        + [(5000 + i, "z", None) for i in range(5)]
    )
    corpus = spark.createDataFrame(rows, "doc_id long, lang string, n_tok int")
    # equal token targets: b is the bottleneck BY TOKENS (10k < 100k),
    # kept whole; a samples at ~10% of docs
    out = dataops.sample_to_mixture(
        corpus, "lang", {"a": 1, "b": 1}, weight_col="n_tok"
    )
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(FF.count("*").alias("n")).collect()}
    assert kept["b"] == 1000
    assert "z" not in kept
    assert abs(kept.get("a", 0) - 10) <= 10  # Binomial(100, .1), generous band
    # unweighted flips it: a (100 docs) is the bottleneck by doc count
    out2 = dataops.sample_to_mixture(corpus.fillna(0), "lang", {"a": 1, "b": 1})
    kept2 = {r["lang"]: r["n"] for r in out2.groupBy("lang").agg(FF.count("*").alias("n")).collect()}
    assert kept2["a"] == 100
    with pytest.raises(ValueError):
        dataops.sample_to_mixture(
            corpus.withColumn("w", FF.lit(0.5)), "lang", {"a": 1}, weight_col="w"
        )


def test_embedding_dispersion_semantics(spark):
    """Planted geometry: a collapsed group (identical vectors) has
    dispersion 0; a two-point group at distance d has mean squared distance
    from the centroid of (d/2)^2; scale in fixed-point units (1e6/component)."""
    import math

    a = [1.0, 0.0]
    b = [0.0, 0.0]
    rows = (
        [(i, a, 0) for i in range(4)]           # collapsed
        + [(10, a, 1), (11, b, 1)]              # two points, |a-b| = 1.0
    )
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["g"]: r for r in dataops.embedding_dispersion(embs, "label").collect()}
    assert out[0]["dispersion"] == 0.0 and out[0]["n"] == 4
    # fixed point: components scaled 1e6 -> d = 1e6, (d/2)^2 = 2.5e11
    assert math.isclose(out[1]["dispersion"], 2.5e11, rel_tol=1e-12)


def test_embedding_ops_reject_ragged_and_null_vectors(spark):
    """_per_dim_sums integrity guard: mixed vector lengths or NULL
    components within a group fail loudly instead of silently computing a
    wrong, order-dependent dispersion/centroid (per-dimension counts would
    diverge and first(n) would pick an arbitrary one)."""
    from py4j.protocol import Py4JJavaError

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [1.0, 2.0, 3.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    with pytest.raises(Exception) as ei:
        dataops.embedding_dispersion(ragged, "label").collect()
    assert "uniform vector length" in str(ei.value)
    nullcomp = spark.createDataFrame(
        [(1, [1.0, None], 0), (2, [1.0, 2.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    with pytest.raises(Exception) as ei:
        dataops.embedding_centroid_drift(
            nullcomp.union(
                spark.createDataFrame(
                    [(3, [1.0, 1.0], 1)], "vec_id long, embedding array<float>, label int"
                )
            ),
            "label",
        ).collect()
    assert "NULL components" in str(ei.value) or "uniform vector length" in str(ei.value)


def test_embedding_ops_reject_cross_group_dim_mismatch_and_null_vectors(spark):
    """Two internally-uniform groups with DIFFERENT vector lengths must fail
    loudly (the pairwise join on the dimension index alone would otherwise
    silently compute cosine over the common prefix), and a NULL or empty
    vector must raise instead of being silently excluded from n."""
    crossdim = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0), (3, [1.0, 2.0, 3.0], 1), (4, [4.0, 5.0, 6.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    with pytest.raises(Exception) as ei:
        dataops.embedding_centroid_drift(crossdim, "label").collect()
    assert "ALL groups" in str(ei.value) or "uniform vector length" in str(ei.value)
    for bad_vec in (None, []):
        bad = spark.createDataFrame(
            [(1, [1.0, 2.0], 0), (2, bad_vec, 0)],
            "vec_id long, embedding array<float>, label int",
        )
        with pytest.raises(Exception) as ei:
            dataops.embedding_dispersion(bad, "label").collect()
        assert "NULL or empty" in str(ei.value)
