"""ETL change-management operators — the reference's home domain.

An ETL-aggregations pipeline (the reference's stated purpose, SURVEY.md
§0) lives and dies by incremental loads: detecting what changed between
snapshots and merging deltas into a base table. Both operators here are
pure DataFrame compositions whose semantics hash-check against ANSI SQL,
so the driver proves the change-detection logic, not just the happy
path. ``agg_incremental_merge`` (operators/aggs.py) covers the third leg
— merging partial *aggregates*.

Scale posture: both shapes shuffle once on the business key (the same
key the base table would be bucketed/partitioned by in a warehouse), and
the classification logic is pure codegen-friendly column expressions.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register


@register(
    "etl_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    )
    SELECT
      COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
      CASE
        WHEN old.o_orderkey IS NULL THEN 'insert'
        WHEN new.o_orderkey IS NULL THEN 'delete'
        WHEN old.o_orderstatus <> new.o_orderstatus
          OR old.o_totalprice <> new.o_totalprice THEN 'update'
        ELSE 'unchanged'
      END AS change_type
    FROM old FULL JOIN new ON old.o_orderkey = new.o_orderkey
    """,
    tier="P2",
)
def etl_snapshot_diff(spark, t):
    """Snapshot diff: classify every key across two table versions as
    insert / delete / update / unchanged (CDC-style change detection).

    The two 'snapshots' are overlapping date slices of orders, so all
    four classes occur. One full outer join on the key; the classifier
    is a null-pattern CASE — no UDF, fully codegen. At warehouse scale
    both sides are bucketed by the key, making the diff shuffle-free
    (see ``join_bucketed_colocated``).
    """
    orders = t["orders"]
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    old = orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select(*cols)
    new = orders.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    ).select(*[F.col(c).alias(f"n_{c}") for c in cols])
    j = old.join(
        new, old["o_orderkey"] == new["n_o_orderkey"], "full"
    )
    return j.select(
        F.coalesce("o_orderkey", "n_o_orderkey").alias("o_orderkey"),
        F.when(F.col("o_orderkey").isNull(), "insert")
        .when(F.col("n_o_orderkey").isNull(), "delete")
        .when(
            (F.col("o_orderstatus") != F.col("n_o_orderstatus"))
            | (F.col("o_totalprice") != F.col("n_o_totalprice")),
            "update",
        )
        .otherwise("unchanged")
        .alias("change_type"),
    )


@register(
    "etl_upsert_merge",
    oracle="""
    WITH delta AS (
      SELECT o_orderkey, o_custkey, o_totalprice * 1.1 AS o_totalprice,
             'delta' AS src
      FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    ),
    base AS (
      SELECT o_orderkey, o_custkey, o_totalprice, 'base' AS src FROM orders
    ),
    merged AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderkey
        ORDER BY CASE WHEN src = 'delta' THEN 0 ELSE 1 END) AS rn
      FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
    )
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice, src
    FROM merged WHERE rn = 1
    """,
    tier="P2",
)
def etl_upsert_merge(spark, t):
    """Upsert (MERGE) without a table format: delta rows win over base
    rows on key collision, union-then-rank style.

    The delta re-prices recent orders by +10 %; the merge keeps exactly
    one row per key, preferring the delta. This is the portable
    DataFrame form of ``MERGE INTO`` — union + per-key priority
    row_number — which shuffles once on the key and needs no
    format-level transaction support. The ``src`` column in the output
    makes the winner visible to the hash-check.
    """
    orders = t["orders"]
    base = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", F.lit("base").alias("src")
    )
    delta = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        F.lit("delta").alias("src"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.when(F.col("src") == "delta", 0).otherwise(1)
    )
    return (
        base.unionByName(delta)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "src",
        )
    )
