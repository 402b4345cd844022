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
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hg64spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q_latency_quantiles_by_tool(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
