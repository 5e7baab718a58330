#!/usr/bin/env python
"""Full-registry oracle sweep at an arbitrary scale factor.

The driver's correctness gate runs at sf0.01; this sweep runs the SAME
comparison at any fixture scale — most usefully sf0.1, where 10× the
data exposes cross-engine float-association drift the gate scale can't
(the r3 sweep caught five: 4-dp rounds of large double sums and a
percentile sketch losing exactness; see the "Fix five cross-engine
divergences" commit).

Usage: python tools/oracle_sweep.py [sf_dir]     (default sf0.1, ~45 min)
Prints ALL MATCH or one diff report per failing query.
"""

from __future__ import annotations

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
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("oracle-sweep")
        .config("spark.ui.enabled", "false")
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
    fails: list[str] = []
    t0 = time.time()
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf)
            if name in osql:
                # family first: type skew (the r3 HUGEINT class) hashes
                # red at the driver even when the value compare passes
                rep = type_family_report(
                    name, df, con, osql[name]
                ) or diff_report(
                    name, *spark_rows(df), *duck_rows(con, osql[name])
                )
                if rep:
                    fails.append(rep)
            else:
                assert df.count() >= 0
        except Exception as ex:  # keep sweeping; report at the end
            fails.append(f"[{name}] EXC {type(ex).__name__}: {str(ex)[:200]}")
        print(".", end="", flush=True, file=sys.stderr)
    print(file=sys.stderr)
    print(
        "FAILURES:" if fails else "ALL MATCH",
        len(qs),
        f"{time.time() - t0:.0f}s",
    )
    for f in fails:
        print(f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
