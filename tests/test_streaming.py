"""Structured Streaming sketch aggregation: file-source stream, availableNow
trigger, incremental appends, compaction — result must equal the batch
pipeline over the same rows at every point."""

import glob

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from hg64spark import agg
from hg64spark.hg64 import HG64
from hg64spark.streaming import StreamingSketch

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = StructType(
    [StructField("event_type", StringType()), StructField("v", LongType())]
)


@pytest.fixture()
def source(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", F.floor(F.col("value") * 1000).cast("long").alias("v")
    )
    src = tmp_path / "src"
    for i in range(3):
        ev.filter(F.col("v") % 3 == i).coalesce(1).write.parquet(str(src / f"chunk{i}"))
    files = []
    for i in range(3):
        files.append(glob.glob(str(src / f"chunk{i}" / "part-*.parquet"))[0])
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    return ev, files, stream_dir


def _run_stream(spark, stream_dir, state_dir, ckpt_dir):
    ss = StreamingSketch(str(state_dir), "v", ["event_type"])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir))
    )
    q = ss.start(stream, str(ckpt_dir), available_now=True)
    q.awaitTermination(300)
    return ss


def test_stream_equals_batch_and_is_incremental(spark, tmp_path, source):
    ev, files, stream_dir = source
    import shutil

    # first two chunks arrive
    shutil.copy(files[0], stream_dir / "f0.parquet")
    shutil.copy(files[1], stream_dir / "f1.parquet")
    ss = _run_stream(spark, stream_dir, tmp_path / "state", tmp_path / "ckpt")

    seen = spark.read.parquet(str(stream_dir / "f0.parquet"), str(stream_dir / "f1.parquet"))
    want = {
        r["event_type"]: HG64.deserialize(r["sketch"])
        for r in agg.hg64_agg(seen, "v", ["event_type"], 5, method="arrow").collect()
    }
    got = {r["event_type"]: HG64.deserialize(r["sketch"]) for r in ss.result(spark).collect()}
    assert got == want

    # the third chunk arrives later; restart picks up only the new file
    shutil.copy(files[2], stream_dir / "f2.parquet")
    ss = _run_stream(spark, stream_dir, tmp_path / "state", tmp_path / "ckpt")
    all_rows = spark.read.parquet(*[str(stream_dir / f"f{i}.parquet") for i in range(3)])
    want_all = {
        r["event_type"]: HG64.deserialize(r["sketch"])
        for r in agg.hg64_agg(all_rows, "v", ["event_type"], 5, method="arrow").collect()
    }
    got_all = {r["event_type"]: HG64.deserialize(r["sketch"]) for r in ss.result(spark).collect()}
    assert got_all == want_all

    # compaction preserves the result and shrinks state to one batch dir
    ss.compact(spark)
    got_c = {r["event_type"]: HG64.deserialize(r["sketch"]) for r in ss.result(spark).collect()}
    assert got_c == want_all
    assert len(ss._batch_dirs()) == 1


def test_stateful_operator_accumulates_across_batches(spark, tmp_path, source):
    """applyInPandasWithState keeps per-group sketch state in the streaming
    state store: after both micro-batches, the latest emitted sketch per
    group equals the batch pipeline over all rows seen."""
    import shutil

    from hg64spark.streaming import sketch_stream_stateful

    ev, files, stream_dir = source
    shutil.copy(files[0], stream_dir / "f0.parquet")
    shutil.copy(files[1], stream_dir / "f1.parquet")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir))
    )
    updated = sketch_stream_stateful(stream, "v", ["event_type"])
    q = (
        updated.writeStream.format("memory")
        .queryName("stateful_sketches")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "st_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.sql(
        "SELECT * FROM (SELECT event_type, sketch, row_number() OVER "
        "(PARTITION BY event_type ORDER BY monotonically_increasing_id() DESC) rn "
        "FROM stateful_sketches) WHERE rn = 1"
    ).collect()
    got = {r["event_type"]: HG64.deserialize(bytes(r["sketch"])) for r in rows}

    seen = spark.read.parquet(str(stream_dir / "f0.parquet"), str(stream_dir / "f1.parquet"))
    want = {
        r["event_type"]: HG64.deserialize(r["sketch"])
        for r in agg.hg64_agg(seen, "v", ["event_type"], 5, method="arrow").collect()
    }
    assert got == want


def test_compaction_crash_window_does_not_double_count(spark, tmp_path, source):
    """Regression: a compacted dir becoming visible before the originals are
    removed must not double-count.  Simulate the crash by restoring a consumed
    batch dir after compact() (as if rmtree never ran): the manifest's
    tombstones keep it invisible."""
    import shutil

    ev, files, stream_dir = source
    shutil.copy(files[0], stream_dir / "f0.parquet")
    shutil.copy(files[1], stream_dir / "f1.parquet")
    ss = _run_stream(spark, stream_dir, tmp_path / "state", tmp_path / "ckpt")
    want = {r["event_type"]: HG64.deserialize(r["sketch"]) for r in ss.result(spark).collect()}

    # snapshot a batch dir, compact, then "resurrect" it (crash-before-cleanup)
    batch_dirs = ss._batch_dirs()
    saved = tmp_path / "saved_batch"
    shutil.copytree(batch_dirs[0], saved)
    ss.compact(spark)
    shutil.copytree(saved, batch_dirs[0])

    got = {r["event_type"]: HG64.deserialize(r["sketch"]) for r in ss.result(spark).collect()}
    assert got == want  # resurrected dir is tombstoned, not double-counted
