#!/usr/bin/env python
"""Skew-robustness probe — local evidence for the 100 TB posture's
hot-key story (SCALING.md §skew).

Builds a deliberately skewed join: K-replicated events (tools/
scaling.py fixtures) with a synthetic hot key owning ~40% of all rows
(``pmod(xxhash64(event_id), 10) < 4 → key -1``), shuffle-joined (no
broadcast) to a per-user dim.

Two measurements:

1. **Reducer balance** — rows landing on the fattest of 32 reducers
   when the fact shuffles by the bare key vs by (key, salt). This is
   the quantity that pins a real cluster: a 40% hot key means 40% of
   100 TB funnels through ONE task. Measured with an explicit
   ``repartition`` so AQE coalescing can't blur it.
2. **End-to-end join wall** (warm) for naive sort-merge, fact-salted
   ×16, and naive-with-AQE-skew-split — all checksum-verified
   identical. NOTE the honest local reading: at 3M rows the hot task
   is still small in absolute terms, so salting's overhead (×16 dim
   explode + wider sort key) exceeds its benefit HERE; the reducer
   -balance table is what scales, and AQE's split gets the same
   balance without the dim explode when the build side allows it.
   Salting remains the manual tool for aggregation skew and for joins
   AQE can't split.

Usage: python tools/skew_probe.py [K]     (default 30 → ~3M fact rows)
Prints markdown; paste into SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from splio_etl_aggregations_spark.session import get_spark  # noqa: E402

N_RED = 32  # reducers for the balance measurement


def build_frames(spark, k: int):
    from tools.scaling import scaled_tables

    t = scaled_tables(spark, k)
    # ~40% of rows collapse onto key -1, rest keep their user_id — the
    # "one customer is half the warehouse" shape. Deterministic.
    fact = (
        t["events"]
        .withColumn(
            "skew_uid",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(10)) < 4, F.lit(-1)
            ).otherwise(F.col("user_id")),
        )
        .select("skew_uid", "value")
    )
    dim = (
        fact.select("skew_uid")
        .distinct()
        .withColumn(
            "boost", (F.pmod(F.xxhash64("skew_uid"), F.lit(7)) + 1).cast("double")
        )
    )
    return fact, dim


def reducer_max(df, *keys) -> int:
    """Rows on the fattest reducer of an explicit N_RED-way hash
    shuffle on ``keys`` — AQE never touches a user repartition, so
    this is the raw shuffle balance."""
    return (
        df.repartition(N_RED, *[F.col(k) for k in keys])
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )


def checksum(df) -> float:
    return df.agg(
        F.round(F.sum(F.col("value") * F.col("boost")), 2).alias("c")
    ).collect()[0]["c"]


def run_naive(spark, fact, dim) -> float:
    return checksum(fact.hint("merge").join(dim, "skew_uid"))


def run_salted(spark, fact, dim, n_salt: int = 16) -> float:
    # salt the FACT by row identity (NOT by the join key — that hash is
    # constant per key and would not spread the hot key at all); the
    # dim carries every salt per key, so each fact row matches exactly
    # once and the checksum is salt-invariant
    sf = fact.withColumn(
        "salt",
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt)
        ).cast("int"),
    )
    sd = dim.select(
        "skew_uid",
        "boost",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])).alias("salt"),
    )
    return checksum(sf.hint("merge").join(sd, ["skew_uid", "salt"]))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark()
    fact, dim = build_frames(spark, k)
    fact.cache()
    n = fact.count()
    dim.cache().count()

    salted = fact.withColumn(
        "salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(16)).cast(
            "int"
        ),
    )
    print(f"Reducer balance ({N_RED} reducers, {n:,} fact rows, "
          "perfect = {:,}):".format(n // N_RED))
    print("| shuffle key | max reducer rows |")
    print("|---|---|")
    print(f"| skew_uid (naive) | {reducer_max(fact, 'skew_uid'):,} |")
    print(f"| (skew_uid, salt%16) | {reducer_max(salted, 'skew_uid', 'salt'):,} |")

    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    aqe_skew = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    strategies = [
        ("naive sort-merge", run_naive, no_bcast),
        ("salted ×16", run_salted, no_bcast),
        ("naive + AQE skew split", run_naive, aqe_skew),
    ]
    print(f"\n| join strategy (K={k}) | warm sec | checksum |")
    print("|---|---|---|")
    for label, fn, confs in strategies:
        old = {c: spark.conf.get(c, None) for c in confs}
        for c, v in confs.items():
            spark.conf.set(c, v)
        try:
            fn(spark, fact, dim)  # warm-up
            t0 = time.time()
            c = fn(spark, fact, dim)
            dt = time.time() - t0
        finally:
            for cfg, v in old.items():
                if v is None:
                    spark.conf.unset(cfg)
                else:
                    spark.conf.set(cfg, v)
        print(f"| {label} | {dt:.2f} | {c} |")


if __name__ == "__main__":
    main()
