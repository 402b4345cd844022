"""Checkpoint/resume: killed-job replay semantics — only unfinished files are
reprocessed, and the resumed result is identical to a single-shot job."""

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from hg64spark import agg
from hg64spark.checkpoint import CheckpointedSketchAgg
from hg64spark.hg64 import HG64

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def split_files(spark, tmp_path):
    """Split events into 4 separate single-file parquet 'partitions'."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", F.floor(F.col("value") * 1000).cast("long").alias("v")
    )
    files = []
    for i in range(4):
        d = str(tmp_path / f"chunk{i}")
        ev.filter(F.col("v") % 4 == i).coalesce(1).write.parquet(d)
        files.append(glob.glob(f"{d}/part-*.parquet")[0])
    return files


def test_resume_processes_only_unfinished(spark, tmp_path, split_files):
    ck = CheckpointedSketchAgg(str(tmp_path / "ckpt"), "v", ["event_type"])

    # first run "dies" after two files
    first = ck.process(spark, split_files[:2])
    assert len(first) == 2
    assert ck.done_files(spark) == {os.path.abspath(f) for f in split_files[:2]}

    # resume with the full file list -> only the missing two are processed
    second = ck.process(spark, split_files)
    assert sorted(second) == sorted(os.path.abspath(f) for f in split_files[2:])

    # idempotent: a third call does nothing
    assert ck.process(spark, split_files) == []

    # merged result identical to a single-shot aggregation over all files
    resumed = {
        r["event_type"]: HG64.deserialize(r["sketch"])
        for r in ck.result(spark).collect()
    }
    direct_df = spark.read.parquet(*split_files)
    direct = {
        r["event_type"]: HG64.deserialize(r["sketch"])
        for r in agg.hg64_agg(direct_df, "v", ["event_type"], 5).collect()
    }
    assert resumed == direct


def test_uncommitted_run_invisible(spark, tmp_path, split_files):
    ck = CheckpointedSketchAgg(str(tmp_path / "ckpt"), "v", [])
    ck.process(spark, split_files[:1])
    # simulate a killed job: a run directory without _SUCCESS
    dead = tmp_path / "ckpt" / "run=deadbeef"
    dead.mkdir()
    (dead / "part-00000.parquet").write_bytes(b"garbage")
    assert ck.done_files(spark) == {os.path.abspath(split_files[0])}


def test_metrics_lineage(spark, tmp_path, split_files):
    ck = CheckpointedSketchAgg(str(tmp_path / "ckpt"), "v", [])
    ck.process(spark, split_files)
    m = ck.metrics(spark).collect()
    from hg64spark.checkpoint import _norm_file

    files_seen = {_norm_file(r["lineage_file"]) for r in m}
    nonempty = {
        os.path.abspath(f)
        for f in split_files
        if spark.read.parquet(f).count() > 0
    }
    assert files_seen == nonempty  # metrics rows exist for every ingesting file
    total_rows = sum(r["m_rows"] for r in m)
    assert total_rows == spark.read.parquet(*split_files).count()
    assert all(r["m_ns_per_row"] > 0 and r["m_sketch_bytes"] > 0 for r in m)


def test_derive_hook(spark, tmp_path, split_files):
    ck = CheckpointedSketchAgg(str(tmp_path / "ckpt"), "v2", [])
    ck.process(spark, split_files, derive=lambda df: df.select((F.col("v") * 2).alias("v2")))
    sk = HG64.deserialize(ck.result(spark).collect()[0]["sketch"])
    direct = spark.read.parquet(*split_files).select((F.col("v") * 2).alias("v2")).toPandas()
    local = HG64(5).add_values(direct["v2"].to_numpy().astype(np.uint64))
    assert sk == local


def test_lineage_survives_shuffling_derive(spark, tmp_path, split_files):
    """Regression: input_file_name() returns '' after a derive's exchange;
    lineage must be attached per file BEFORE deriving.  Uses a groupBy derive
    (the turn-count shape)."""
    ck = CheckpointedSketchAgg(str(tmp_path / "ckpt"), "n", [])
    ck.process(
        spark,
        split_files,
        derive=lambda df: df.groupBy("event_type").agg(F.count("*").alias("n")),
    )
    m = ck.metrics(spark).collect()
    assert m, "no metrics rows"
    from hg64spark.checkpoint import _norm_file

    files_seen = {_norm_file(r["lineage_file"]) for r in m}
    assert "" not in files_seen
    nonempty = {os.path.abspath(f) for f in split_files if spark.read.parquet(f).count() > 0}
    assert files_seen == nonempty
