"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (per-tool inter-turn latency
quantiles via the distributed hg64 sketch pipeline) on sf0.001.
``queries()`` / ``oracle_sql()`` delegate to ``hg64spark.queries``, where each
Spark query is defined next to its DuckDB oracle.  The hg64 oracles are exact
(bit-for-bit) — see ``hg64spark/sqloracle.py``.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from hg64spark import queries as _q  # noqa: E402

_SHIPPED: set[int] = set()


def _ensure_package(spark: SparkSession) -> None:
    """Ship hg64spark to the executors (addPyFile) so the vectorized-UDF
    stages unpickle regardless of the harness's working directory — the
    driver-side sys.path insert above does not reach Python workers."""
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    zip_path = os.path.join(tempfile.gettempdir(), f"hg64spark_pyfiles_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        pkg = os.path.join(_REPO, "hg64spark")
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, _REPO))
    sc.addPyFile(zip_path)
    _SHIPPED.add(id(sc))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_package(spark)
    return _q.q_latency_quantiles_by_tool(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_package(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
