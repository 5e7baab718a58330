"""Set operations (SURVEY.md §2-G).

Two comparable projections with controlled overlap:
  A = custkeys of urgent orders (bag — a customer repeats per order)
  B = custkeys of high-value orders (> 250k)
Bag vs set variants exercise union/intersect/except in both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import register

_A_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
_B_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000"


def _a(t) -> DataFrame:
    return (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )


def _b(t) -> DataFrame:
    return (
        t["orders"]
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("custkey"))
    )


@register("set_union_all", oracle=f"{_A_SQL} UNION ALL {_B_SQL}", tier="P1")
def set_union_all(spark, t):
    """Bag union (no dedup, no shuffle — pure concatenation of partitions)."""
    return _a(t).unionByName(_b(t))


@register("set_union_distinct", oracle=f"{_A_SQL} UNION {_B_SQL}", tier="P1")
def set_union_distinct(spark, t):
    """Set union (union + hash distinct)."""
    return _a(t).unionByName(_b(t)).distinct()


@register("set_intersect", oracle=f"{_A_SQL} INTERSECT {_B_SQL}", tier="P1")
def set_intersect(spark, t):
    """Set intersection (compiles to a left-semi join over distinct keys)."""
    return _a(t).intersect(_b(t))


@register("set_except", oracle=f"{_A_SQL} EXCEPT {_B_SQL}", tier="P1")
def set_except(spark, t):
    """Set difference (left-anti join over distinct keys)."""
    return _a(t).subtract(_b(t))


@register("set_intersect_all", oracle=f"{_A_SQL} INTERSECT ALL {_B_SQL}", tier="P2")
def set_intersect_all(spark, t):
    """Bag intersection (multiplicity = min of the two sides)."""
    return _a(t).intersectAll(_b(t))


@register("set_except_all", oracle=f"{_A_SQL} EXCEPT ALL {_B_SQL}", tier="P2")
def set_except_all(spark, t):
    """Bag difference (multiplicity subtraction)."""
    return _a(t).exceptAll(_b(t))


@register(
    "set_symmetric_diff",
    oracle=f"""
    SELECT custkey, 'a_only' AS side FROM ({_A_SQL} EXCEPT {_B_SQL})
    UNION ALL
    SELECT custkey, 'b_only' FROM ({_B_SQL} EXCEPT {_A_SQL})
    """,
    tier="P2",
)
def set_symmetric_diff(spark, t):
    """Symmetric difference with provenance: keys in exactly one of the
    two sets, tagged with which side they came from — the churn/drift
    view (who became urgent-only, who became high-value-only) that a
    plain EXCEPT loses by dropping direction.

    Composes two anti-join differences; each side's distinct collapses
    map-side before the anti-join probes, so the cost is two semi-join
    shapes over the already-reduced key sets.
    """
    a, b = _a(t), _b(t)
    return (
        a.subtract(b).select("custkey", F.lit("a_only").alias("side"))
        .unionByName(
            b.subtract(a).select("custkey", F.lit("b_only").alias("side"))
        )
    )
