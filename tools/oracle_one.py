"""Differential-check a SUBSET of registry queries against DuckDB.

Usage: python tools/oracle_one.py <sf_dir> <query_id> [<query_id> ...]

Same compare path as tools/oracle_sweep.py (type-family first, then
row/value diff) but scoped to the named IDs — the iterate-fast loop
when touching one operator, where the full 393-query sweep's ~13 min
is the wrong tool. Prints per-query MATCH/DIFF and warm wall seconds
for the Spark side.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf, names = sys.argv[1], sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("oracle-one")
        .config("spark.ui.enabled", "false")
        # match get_spark()'s heap: the 1g default OOMs when several
        # sf0.1 heavy shapes share one session
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    from tests.compare import (
        diff_report,
        duck_rows,
        spark_rows,
        type_family_report,
    )

    qs, osql = e.queries(), e.oracle_sql()
    bad = 0
    for name in names:
        fn = qs[name]
        fn(spark, sf).collect()  # warm fixture/JIT
        t0 = time.time()
        df = fn(spark, sf)
        srows = spark_rows(df)
        dt = time.time() - t0
        if name in osql:
            rep = type_family_report(name, df, con, osql[name]) or diff_report(
                name, *srows, *duck_rows(con, osql[name])
            )
        else:
            rep = None if srows[0] else "rows-only: 0 rows"
        if rep:
            bad += 1
            print(f"DIFF  {name}  ({dt:.2f}s)\n{rep[:1500]}")
        else:
            print(f"MATCH {name}  ({dt:.2f}s warm, {len(srows[0])} rows)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
