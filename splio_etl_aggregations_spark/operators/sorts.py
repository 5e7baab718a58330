"""Sort / limit / top-k (SURVEY.md §2-F)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.helpers import r4, topk
from ..registry import register


@register(
    "sort_multi_key",
    oracle="""
    SELECT c_custkey, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC
    """,
    tier="P1",
)
def sort_multi_key(spark, t):
    """Multi-key sort with explicit null placement (range-partitioned
    TakeOrdered-style total sort; content is what the hash checks)."""
    return (
        t["customer"]
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy(F.desc_nulls_last("c_acctbal"), F.asc("c_custkey"))
    )


@register(
    "limit_topk_global",
    oracle="""
    SELECT c.c_custkey, c.c_name, round(SUM(o.o_totalprice), 4) AS spend
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY spend DESC, c.c_custkey
    LIMIT 10
    """,
    tier="P0",
)
def limit_topk_global(spark, t):
    """Global top-10 customers by spend. Sort+limit compiles to
    TakeOrderedAndProject — per-partition top-k then driver merge, never a
    full sort (asserted in tests/test_plans.py)."""
    spend = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(r4(F.sum("o_totalprice")).alias("spend"))
    )
    return topk(spend, [F.desc("spend"), F.asc("c_custkey")], 10)


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
    tier="P2",
)
def limit_offset(spark, t):
    """Pagination over a deterministic total order, via the SQL surface."""
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 10
        """
    )
