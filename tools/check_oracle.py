"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row counts, column
names, order-insensitive values, AND pandas dtypes.

The dtype leg exists because the driver hashes *pandas frames* (Spark
``toPandas()`` vs DuckDB ``fetchdf()``), so a DuckDB column that widens past
BIGINT (``sum(BIGINT)`` -> HUGEINT -> float64/object in pandas) hash-mismatches
a Spark int64 even when every value is numerically identical.  That class
fired twice (r5 ``pack_token_shards``, r6 ``decayed_topk_users``) while the
repr-based value compare here stayed green — Python ints from ``fetchall()``
hide the frame dtype.  Comparing ``fetchdf()`` dtypes makes this replica
fail exactly where the driver fails.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]


def frame_dtypes(pdf):
    """Column -> pandas dtype kind, the dtype-sensitivity the driver's
    pandas-frame hash has.  Kind (not full dtype) so int64 vs int64 matches
    while int64 vs float64/object (the HUGEINT decay) fails; datetime64 unit
    differences (DuckDB [us] vs older pandas [ns]) are deliberately ignored —
    both engines emit the same instant and driver gates with timestamp
    outputs have always matched."""
    return {c: pdf[c].dtype.kind for c in pdf.columns}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
            if name not in oracles:
                print(f"[rows-only] {name}: {len(srows)} rows")
                continue
            opdf = con.execute(oracles[name]).fetchdf()
            ocols = list(opdf.columns)
            orows = [tuple(r) for r in opdf.itertuples(index=False, name=None)]
            s_norm, s_c = norm_rows(scols, srows)
            o_norm, o_c = norm_rows(ocols, orows)
            ok_cols = s_c == o_c
            ok_count = len(s_norm) == len(o_norm)
            ok_vals = s_norm == o_norm
            sd, od = frame_dtypes(spdf), frame_dtypes(opdf)
            ok_dtypes = sd == od
            status = "PASS" if (ok_cols and ok_count and ok_vals and ok_dtypes) else "FAIL"
            print(f"[{status}] {name}: spark={len(s_norm)} oracle={len(o_norm)} cols={'ok' if ok_cols else (s_c, o_c)}"
                  + ("" if ok_dtypes else f" DTYPES spark={sd} oracle={od}"))
            if status == "FAIL":
                failed.append(name)
                if not ok_vals and ok_cols and ok_count:
                    diffs = [(a, b) for a, b in zip(s_norm, o_norm) if a != b][:5]
                    for a, b in diffs:
                        print(f"    spark : {a}\n    oracle: {b}")
                elif not ok_count:
                    s_only = set(s_norm) - set(o_norm)
                    o_only = set(o_norm) - set(s_norm)
                    for r in list(s_only)[:3]:
                        print(f"    spark-only : {r}")
                    for r in list(o_only)[:3]:
                        print(f"    oracle-only: {r}")
        except Exception as e:
            failed.append(name)
            print(f"[ERROR] {name}: {type(e).__name__}: {e}")
    spark.stop()
    print(("ALL PASS" if not failed else f"FAILED: {failed}"))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
