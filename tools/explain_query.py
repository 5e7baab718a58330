#!/usr/bin/env python
"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/explain_query.py <out_dir> <suffix> <query_id> [...]

Writes <out_dir>/<query_id>_<suffix>.txt for each id — the evidence
files the optimization rounds commit under plans/rNN/ (the judge checks
plan claims against these, since it cannot run Spark itself).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from splio_etl_aggregations_spark import register_all  # noqa: E402
from splio_etl_aggregations_spark.plans.checks import explain_str  # noqa: E402
from splio_etl_aggregations_spark.registry import all_queries  # noqa: E402
from splio_etl_aggregations_spark.session import get_spark  # noqa: E402
from splio_etl_aggregations_spark.sources.loader import load  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    register_all()
    spark = get_spark(app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load(spark, SF)
    qs = all_queries()
    for name in names:
        df = qs[name].builder(spark, tables)
        txt = explain_str(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
