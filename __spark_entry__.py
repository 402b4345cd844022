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

_SHIPPED: set[str] = set()
_ZIP_PATH: str | None = None


def _package_zip() -> str:
    """Build the executor zip exactly once per process, atomically (mkstemp +
    os.replace into a unique per-instance name) — no reuse of files from
    earlier processes, no truncated zips visible to anyone."""
    global _ZIP_PATH
    if _ZIP_PATH is None:
        fd, tmp = tempfile.mkstemp(suffix=".zip", prefix="hg64spark_build_")
        os.close(fd)
        pkg = os.path.join(_REPO, "hg64spark")
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, _REPO))
        final = tmp.replace("hg64spark_build_", "hg64spark_pyfiles_")
        os.replace(tmp, final)
        _ZIP_PATH = final
    return _ZIP_PATH


def _ensure_package(spark: SparkSession) -> None:
    """Ship hg64spark to the executors (addPyFile) so the vectorized-UDF
    stages unpickle regardless of the harness's working directory — the
    driver-side sys.path insert above does not reach Python workers.
    Keyed by applicationId (unique per SparkContext; id() can be reused
    after GC)."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED.add(app)


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
