"""Scalar pandas-UDF surface over serialized sketch columns.

Once sketches are persisted as binary columns (checkpoint tables, streaming
state, rollup tables), users query them straight from SQL:

    SELECT tool, hg64_quantile(sketch, 0.99) AS p99 FROM tool_sketches

All UDFs are Arrow-batched (`pandas_udf`) and operate on the tiny sketch
blobs, not row data — the expensive aggregation already happened when the
sketch was built, so these are cheap finalizers.  `register(spark)` installs
them for SQL; the module-level objects work in the DataFrame API.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, DoubleType, LongType

from hg64spark.hg64 import HG64


def _isnull(v) -> bool:
    return v is None or (isinstance(v, float) and v != v)


@pandas_udf(LongType())
def hg64_quantile(sketch: pd.Series, q: pd.Series) -> pd.Series:
    """value_at_quantile over a serialized hg64 column (`hg64.c:431-436`).
    SQL convention: null sketch or null q -> null result."""
    out = []
    for blob, qq in zip(sketch, q):
        if _isnull(blob) or _isnull(qq):
            out.append(None)
            continue
        # .astype(int64) wraps UINT64_MAX (q=1.0 / empty sketch) to -1,
        # matching agg.hg64_quantiles — a bare int() would overflow
        out.append(
            int(HG64.deserialize(bytes(blob)).snapshot().value_at_quantile(np.array([qq])).astype(np.int64)[0])
        )
    return pd.Series(out, dtype="Int64")


@pandas_udf(LongType())
def hg64_rank(sketch: pd.Series, value: pd.Series) -> pd.Series:
    """rank_of_value over a serialized hg64 column (`hg64.c:410-429`);
    null-in/null-out."""
    out = []
    for blob, v in zip(sketch, value):
        if _isnull(blob) or _isnull(v):
            out.append(None)
            continue
        out.append(int(HG64.deserialize(bytes(blob)).snapshot().rank_of_value(np.array([v], dtype=np.uint64))[0]))
    return pd.Series(out, dtype="Int64")


@pandas_udf(LongType())
def hg64_population(sketch: pd.Series) -> pd.Series:
    return pd.Series(
        [None if _isnull(b) else HG64.deserialize(bytes(b)).population for b in sketch], dtype="Int64"
    )


@pandas_udf(DoubleType())
def hg64_mean(sketch: pd.Series) -> pd.Series:
    return pd.Series(
        [None if _isnull(b) else HG64.deserialize(bytes(b)).snapshot().mean_variance_corrected()[0] for b in sketch],
        dtype="Float64",
    )


@pandas_udf(BinaryType())
def hg64_merge_pair(a: pd.Series, b: pd.Series) -> pd.Series:
    """Merge two serialized sketches (e.g. combining rollup rows).  A null on
    one side passes the other through unchanged (merge with empty = identity);
    null on both sides -> null."""
    out = []
    for x, y in zip(a, b):
        if _isnull(x) and _isnull(y):
            out.append(None)
        elif _isnull(x):
            out.append(bytes(y))
        elif _isnull(y):
            out.append(bytes(x))
        else:
            sk = HG64.deserialize(bytes(x))
            sk.merge(HG64.deserialize(bytes(y)))
            out.append(sk.serialize())
    return pd.Series(out, dtype="object")


def register(spark: SparkSession) -> None:
    """Install the sketch UDFs for SQL use."""
    spark.udf.register("hg64_quantile", hg64_quantile)
    spark.udf.register("hg64_rank", hg64_rank)
    spark.udf.register("hg64_population", hg64_population)
    spark.udf.register("hg64_mean", hg64_mean)
    spark.udf.register("hg64_merge_pair", hg64_merge_pair)
