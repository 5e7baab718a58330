#!/usr/bin/env python
"""Regenerate PLAN_SIGNATURES.json — the committed plan-shape snapshot
of every registered query (see plans/signatures.py for why).

Run after any DELIBERATE plan change and commit the diff alongside the
code: the JSON diff then documents the plan delta (an added exchange, a
join-strategy swap, a dropped cache layer) for review.

Usage: python tools/plan_signatures.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

# tests/test_plan_signatures.py points this at a temp file to compare a
# fresh derivation against the committed snapshot
OUT = os.environ.get(
    "PLAN_SIGNATURES_OUT",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_SIGNATURES.json",
    ),
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-signatures")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from splio_etl_aggregations_spark.plans.signatures import (
        registry_signatures,
    )

    sigs = registry_signatures(spark, sf)
    with open(OUT, "w") as fh:
        json.dump({"sf_dir": sf, "signatures": sigs}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"{len(sigs)} signatures -> {OUT}")


if __name__ == "__main__":
    main()
