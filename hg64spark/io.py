"""Table-format indirection: every query reads named tables through
:func:`read_table`, so the storage format is configuration, not code
(SURVEY.md §7's "Iceberg is config" claim, made real).

Formats:

* ``parquet`` (default) — ``{location}/{name}.parquet``, what the sandbox
  test data provides.
* ``iceberg`` / any catalog format — ``spark.table(f"{namespace}.{name}")``.
  On a production cluster with an Iceberg catalog configured
  (``spark.sql.catalog.* = org.apache.iceberg.spark.SparkCatalog``), set
  ``spark.conf.set("hg64spark.io.format", "iceberg")`` and
  ``hg64spark.io.namespace`` and every query in this package reads the
  catalog tables instead — partition pruning, hidden-partitioning, and
  snapshot isolation come from the catalog; nothing else in the package
  changes.

The per-session Spark conf is the switch (falls back to the
``HG64SPARK_IO_FORMAT`` / ``HG64SPARK_IO_NAMESPACE`` env vars), so a
spark-submit job flips format with ``--conf hg64spark.io.format=iceberg``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FORMAT_CONF = "hg64spark.io.format"
NAMESPACE_CONF = "hg64spark.io.namespace"
SCHEMA_CONF_PREFIX = "hg64spark.io.schema"

#: (applicationId, path) -> StructType for parquet reads.  Schema METADATA
#: only, never data or results: inferring a parquet schema costs a driver
#: footer read per DataFrameReader (~80ms measured; a query building 2-3
#: table reads pays it each time), while passing the already-inferred
#: StructType costs ~12ms.  Keyed by applicationId so a new session (or a
#: different cluster) re-infers; the csv/json branch below already pins
#: reader schemas by configuration for the same reason.
_PARQUET_SCHEMAS: dict[tuple[str, str], object] = {}


def _conf(spark: SparkSession, key: str, env: str, default: str) -> str:
    try:
        v = spark.conf.get(key)
        if v:
            return v
    except Exception:
        pass
    return os.environ.get(env, default)


def read_table(spark: SparkSession, location: str, name: str) -> DataFrame:
    """Read the named input table (``events``, ``documents``, ...) from
    ``location`` under the configured table format.

    For ``parquet``, ``location`` is the sf directory and the table is the
    file ``{location}/{name}.parquet``.  For catalog formats (``iceberg``),
    ``location`` is ignored in favor of the configured namespace and the
    read goes through ``spark.table`` — the catalog owns layout, pruning and
    snapshots."""
    fmt = _conf(spark, FORMAT_CONF, "HG64SPARK_IO_FORMAT", "parquet").lower()
    if fmt == "parquet":
        path = f"{location}/{name}.parquet"
        key = (spark.sparkContext.applicationId, path)
        schema = _PARQUET_SCHEMAS.get(key)
        if schema is None:
            df = spark.read.parquet(path)
            _PARQUET_SCHEMAS[key] = df.schema
            return df
        return spark.read.schema(schema).parquet(path)
    if fmt == "iceberg":
        ns = _conf(spark, NAMESPACE_CONF, "HG64SPARK_IO_NAMESPACE", "")
        return spark.table(f"{ns}.{name}" if ns else name)
    if fmt in ("csv", "json"):
        # text formats need an explicit schema: inference is a whole extra
        # pass over the data (and types drift run-to-run) — supply the DDL
        # via conf `hg64spark.io.schema.<name>` (or the matching env var),
        # exactly like a production job would pin its reader schemas.
        ddl = _conf(
            spark, f"{SCHEMA_CONF_PREFIX}.{name}", f"HG64SPARK_IO_SCHEMA_{name.upper()}", ""
        )
        if not ddl:
            raise ValueError(
                f"{fmt} read of table '{name}' requires a schema: set spark conf "
                f"'{SCHEMA_CONF_PREFIX}.{name}' to the DDL string"
            )
        reader = spark.read.format(fmt).schema(ddl)
        if fmt == "csv":
            # enforceSchema=false: validate header NAMES against the DDL and
            # fail loudly on mismatch — the default (true) ignores the header
            # and maps columns positionally, silently transposing data when
            # the file's column order differs from the configured schema
            reader = reader.option("header", "true").option("enforceSchema", "false")
        return reader.load(f"{location}/{name}.{fmt}")
    # any other registered DataSourceV2 format: directory-per-table layout
    return spark.read.format(fmt).load(f"{location}/{name}")
