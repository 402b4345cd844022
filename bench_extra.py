"""Extra benchmarks for the optimization round (guide §1.4): per-query
noop-sink isolation, phase decomposition of the composite pipelines, and
``.explain("formatted")`` capture for the plan artifacts in plans/r08/.

NOT part of the frozen driver contract — ``bench.py`` is the measured
artifact; this file exists so optimization claims in OPTIMIZATION_r08.md are
reproducible.  Usage:

    python bench_extra.py time <name> [<name> ...]   # best-of-3 adjacent-warm
    python bench_extra.py phases cluster|minhash|ivf|streaming
    python bench_extra.py plan <query> [out.txt]     # declared-query plan
    python bench_extra.py plans-all <dir>            # every declared query

Timing protocol matches bench.py where it matters: same session config, an
untimed warm pass, then 3 timed attempts each preceded by an adjacent warm
pass; best kept.  Dataops queries run at sf0.01 like the frozen bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF001 = "/root/testdata/sf0.01"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_session():
    import bench

    return bench.make_session(CPUS)


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def best3(name, fn):
    fn()  # untimed warm
    best = None
    samples = []
    for _ in range(3):
        fn()  # adjacent warm
        sec, _ = timed(fn)
        samples.append(round(sec, 3))
        best = sec if best is None else min(best, sec)
    print(f"{name}: best={best:.3f}s samples={samples}", flush=True)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# --------------------------------------------------------------- query defs


def query_fns(spark):
    from hg64spark import dataops, queries as hq

    return {
        "dedup_minhash_lsh": lambda: dataops.q_dedup_minhash_lsh(spark, SF001).count(),
        "dedup_simhash": lambda: dataops.q_dedup_simhash(spark, SF001).count(),
        "dedup_embedding_cosine": lambda: dataops.q_dedup_embedding_cosine(spark, SF001).count(),
        "text_winnow": lambda: dataops.q_text_winnow(spark, SF001).count(),
        "dedup_substring": lambda: dataops.q_dedup_substring(spark, SF001).count(),
        "dedup_cluster": lambda: dataops.q_dedup_cluster(spark, SF001).count(),
        "dedup_cluster_star": lambda: dataops.q_dedup_cluster_star(spark, SF001).count(),
        "ann_ivf_recall": lambda: dataops.q_ann_ivf_recall(spark, SF001, sample_mod=4).count(),
        "ann_brute_topk": lambda: dataops.q_ann_brute_topk(spark, SF001).count(),
        "corpus_pipeline": lambda: dataops.q_corpus_pipeline(spark, SF001).count(),
        "pack_token_shards": lambda: dataops.q_pack_token_shards(spark, SF001).count(),
        "hg64_drift_events": lambda: hq.q_hg64_drift_events(spark, SF001).count(),
        "sliding_hg64_events": lambda: hq.q_sliding_hg64_events(spark, SF001).count(),
        "hg64_overlap_events": lambda: hq.q_hg64_overlap_events(spark, SF001).count(),
        "curriculum_bins": lambda: dataops.q_curriculum_bins(spark, SF001).count(),
        "corpus_minhash_sim": lambda: dataops.q_corpus_minhash_sim(spark, SF001).count(),
        "asof_join_events": lambda: hq.q_asof_join_events(spark, SF001).count(),
        "range_join_events": lambda: hq.q_range_join_events(spark, SF001).count(),
        "multimodal_decode": lambda: (
            dataops.q_multimodal_image_decode(spark, SF001).count()
            + dataops.q_multimodal_audio_decode(spark, SF001).count()
        ),
    }


def cmd_time(names):
    spark = make_session()
    spark.sparkContext.setLogLevel("ERROR")
    fns = query_fns(spark)
    for n in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {n}")
        best3(n, fns[n])
    spark.stop()


# ------------------------------------------------------------------ phases


def cmd_phases(which):
    spark = make_session()
    spark.sparkContext.setLogLevel("ERROR")
    from hg64spark import dataops

    if which == "cluster":
        corpus = dataops.augmented_corpus(spark, SF001)
        best3("pairs_only", lambda: dataops.minhash_neardup_pairs(corpus).count())

        def cc_min():
            pairs = dataops.minhash_neardup_pairs(corpus)
            return dataops.connected_components_min_label(pairs).count()

        def cc_star():
            pairs = dataops.minhash_neardup_pairs(corpus)
            return dataops.connected_components_star(pairs).count()

        best3("pairs+cc_min_label", cc_min)
        best3("pairs+cc_star", cc_star)
        # CC over a PRE-MATERIALIZED pair list (isolates the loop itself)
        mat = dataops.minhash_neardup_pairs(corpus).localCheckpoint(eager=True)
        best3("cc_min_label_only", lambda: dataops.connected_components_min_label(mat).count())
        best3("cc_star_only", lambda: dataops.connected_components_star(mat).count())
    elif which == "minhash":
        corpus = dataops.augmented_corpus(spark, SF001)
        from pyspark.sql import functions as F

        hdist, hot = dataops.hashed_shingles(corpus)
        best3("hashed_shingles_distinct", lambda: noop(hdist))
        best3("hot_set", lambda: noop(hot))
        sig_stream = hdist.join(F.broadcast(hot), "hh", "left_anti")
        best3("sig_stream", lambda: noop(sig_stream))
        best3("full_pairs", lambda: dataops.minhash_neardup_pairs(corpus).count())
    elif which == "ivf":
        e = dataops._scaled(spark, SF001)
        best3("scan_scaled", lambda: noop(e))
        best3("train_local", lambda: dataops._ivf_train(spark, e, sample_mod=4).count())
        cents = dataops._ivf_train(spark, e, sample_mod=4).localCheckpoint(eager=True)
        best3("assign_blas", lambda: dataops._ivf_rank_blas(e, cents, 1).count())
        best3("brute_topk", lambda: dataops.q_ann_brute_topk(spark, SF001).count())
        best3("ivf_full", lambda: dataops.q_ann_ivf_recall(spark, SF001, sample_mod=4).count())
    elif which == "streaming":
        import shutil
        import tempfile

        import bench
        from hg64spark.streaming import StreamingSketch

        tpath = bench.materialize_transcripts(spark)
        lat_path = os.path.join(bench.BENCH_DIR, "latency")

        def run_stream():
            base = tempfile.mkdtemp(prefix="hg64s_bx_stream_")
            try:
                stream = (
                    spark.readStream.schema(spark.read.parquet(lat_path).schema)
                    .parquet(lat_path)
                    .select("tool", "latency_us")
                )
                ss = StreamingSketch(os.path.join(base, "state"), "latency_us", ["tool"])
                q = ss.start(stream, os.path.join(base, "ckpt"), available_now=True)
                q.awaitTermination()
                return ss.result(spark).count()
            finally:
                shutil.rmtree(base, ignore_errors=True)

        best3("streaming_ingest", run_stream)
    else:
        raise SystemExit(f"unknown phase set: {which}")
    spark.stop()


# ------------------------------------------------------------------- plans


def cmd_plan(qname, out_path=None):
    import __spark_entry__ as entry

    spark = make_session()
    spark.sparkContext.setLogLevel("ERROR")
    df = entry.queries()[qname](spark, SF001)
    txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(txt)
        print(f"wrote {out_path}")
    else:
        print(txt)
    spark.stop()


def cmd_plans_all(out_dir):
    import __spark_entry__ as entry

    os.makedirs(out_dir, exist_ok=True)
    spark = make_session()
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF001)
            txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # iterative queries execute eagerly; record that
            txt = f"(plan capture failed: {exc})\n"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        print(f"captured {name}", flush=True)
    spark.stop()


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    cmd = sys.argv[1]
    if cmd == "time":
        cmd_time(sys.argv[2:])
    elif cmd == "phases":
        cmd_phases(sys.argv[2])
    elif cmd == "plan":
        cmd_plan(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
    elif cmd == "plans-all":
        cmd_plans_all(sys.argv[2])
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
