#!/usr/bin/env python
"""Full-registry oracle sweep at an arbitrary scale factor.

The driver's correctness gate runs at sf0.01; this sweep runs the SAME
comparison at any fixture scale — most usefully sf0.1, where 10× the
data exposes cross-engine float-association drift the gate scale can't
(the r3 sweep caught five: 4-dp rounds of large double sums and a
percentile sketch losing exactness; see the "Fix five cross-engine
divergences" commit).

Usage: python tools/oracle_sweep.py [sf_dir] [--out SWEEP_rNN.json]

Prints ALL MATCH or one diff report per failing query. With --out (or
env SWEEP_OUT), also writes a machine-readable per-query artifact
(VERDICT r5 #3: sweep-green claims must be diffable, not prose) —
one record per registered ID: whether it ran, whether it is
oracle-backed, match booleans, and wall seconds.
"""

from __future__ import annotations

import json
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = os.environ.get("SWEEP_OUT")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    sf = args[0] if args else "/root/testdata/sf0.1"
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
    records: dict[str, dict] = {}
    t0 = time.time()
    for name, fn in sorted(qs.items()):
        q0 = time.time()
        rec: dict = {"oracle": name in osql}
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
                rec["match"] = rep is None
                if rep:
                    rec["diff"] = rep[:300]
                    fails.append(rep)
            else:
                rec["rows"] = df.count()
                rec["match"] = rec["rows"] >= 0  # rows-only weak check
        except Exception as ex:  # keep sweeping; report at the end
            rec["match"] = False
            rec["error"] = f"{type(ex).__name__}: {str(ex)[:200]}"
            fails.append(f"[{name}] EXC {rec['error']}")
        rec["sec"] = round(time.time() - q0, 3)
        records[name] = rec
        print(".", end="", flush=True, file=sys.stderr)
    print(file=sys.stderr)
    wall = time.time() - t0
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf,
                    "n_queries": len(qs),
                    "n_oracle": len(osql),
                    "n_match": sum(1 for r in records.values() if r["match"]),
                    "wall_sec": round(wall, 1),
                    "queries": records,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {out_path}", file=sys.stderr)
    print(
        "FAILURES:" if fails else "ALL MATCH",
        len(qs),
        f"{wall:.0f}s",
    )
    for f in fails:
        print(f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
