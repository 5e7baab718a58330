"""Projection / filter / predicates (SURVEY.md §2-B).

Pure Catalyst territory: these compile to whole-stage-codegen'd
filter/project pipelines over the vectorized parquet scan, with the
predicates pushed to the reader.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.helpers import net_price, r4
from ..registry import register


@register(
    "project_select",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity AS qty,
           round(l_extendedprice * (1 - l_discount), 4) AS net
    FROM lineitem
    """,
    tier="P0",
)
def project_select(spark, t):
    """Column subset + rename + derived arithmetic column."""
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        r4(net_price()).alias("net"),
    )


@register(
    "project_cast",
    oracle="""
    SELECT CAST(o_orderkey AS INTEGER) AS okey_int,
           CAST(o_custkey AS DOUBLE) AS ckey_dbl,
           CAST(o_orderdate AS DATE) AS odate,
           CAST(CAST(year(o_orderdate) AS INTEGER) AS VARCHAR) AS oyear_str,
           CAST(o_orderstatus = 'F' AS BOOLEAN) AS is_final
    FROM orders
    """,
    tier="P1",
)
def project_cast(spark, t):
    """Casts across int/long/double/string/date/bool.

    Deliberately avoids double→int (Spark truncates, DuckDB rounds) and
    double→string (formatting differs) — SURVEY.md §5.4 trap list.
    """
    o = t["orders"]
    return o.select(
        F.col("o_orderkey").cast("int").alias("okey_int"),
        F.col("o_custkey").cast("double").alias("ckey_dbl"),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.year("o_orderdate").cast("string").alias("oyear_str"),
        (F.col("o_orderstatus") == "F").alias("is_final"),
    )


@register(
    "filter_simple",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 45
    """,
    tier="P0",
)
def filter_simple(spark, t):
    """Single comparison predicate (pushed to the parquet reader)."""
    return (
        t["lineitem"]
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "filter_compound",
    oracle="""
    SELECT *
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus LIKE 'F%'
      AND NOT (l_tax > 0.07)
    """,
    tier="P1",
)
def filter_compound(spark, t):
    """TPC-H Q6-shaped compound predicate: range ∧ BETWEEN ∧ IN ∧ LIKE ∧ NOT."""
    li = t["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").like("F%")
        & ~(F.col("l_tax") > 0.07)
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    tier="P1",
)
def distinct_rows(spark, t):
    """Duplicate elimination on a projection (partial-agg'd hash distinct)."""
    return t["customer"].select("c_nationkey", "c_mktsegment").distinct()
