"""TPC-H-shaped SQL-entry queries (beyond Q3, aggs.py:sql_shipping_priority).

The reference's users run ad-hoc SQL against the warehouse tables; these
operators prove the ``spark.sql`` entry point end-to-end on the seven
classic TPC-H plan shapes the fixture schema supports verbatim (the
remaining queries touch columns this warehouse doesn't carry — partsupp,
commit/receipt dates, shipmode, phone — and live as shape-preserving
adaptations in ``sqlsuite.py``, completing the 22-query sweep):

- Q5  local-supplier volume: the 6-table snowflake join with a
  same-nation equality between two different dimension paths,
- Q6  forecast revenue change: pure scan+filter+scalar aggregate (the
  pushdown showcase — zero joins, zero shuffles beyond the fold),
- Q10 returned-item ranking: selective fact filter + 4-table join +
  deterministic top-20,
- Q13 customer distribution: zero-preserving LEFT-join count histogram,
- Q14 promo revenue share: conditional aggregation over a dim join,
- Q15 top supplier: CTE consumed twice + scalar MAX subquery,
- Q18 large-volume customer: HAVING subquery driving a fact⋈fact join.

Every statement runs verbatim-equivalent in DuckDB (timestamp literal
syntax aside), so the oracle is the same SQL — the hash check proves the
two engines' whole SQL stacks (parser → optimizer → runtime) agree on
these shapes. Catalyst details verified via explain: date/segment/flag
filters reach the parquet scans, small dims broadcast, ORDER BY+LIMIT
compiles to TakeOrderedAndProject.
"""

from __future__ import annotations

from ..registry import register


@register(
    "sql_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
                 AND s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    tier="P1",
)
def sql_local_supplier_volume(spark, t):
    """TPC-H Q5 shape: revenue per nation from orders where the customer
    and the line's supplier share that nation, within one region and
    year — the snowflake join whose distinguishing feature is the
    same-nation equality BETWEEN two dimension paths (customer→nation
    and supplier→nation), which prunes the join output far below either
    path alone.

    Plan: region/nation/supplier broadcast (dim-sized); the fact chain
    shuffles on the order key; the year filter pushes to the orders
    scan. The nation equality is expressed in the join condition, so
    Catalyst applies it during the join rather than post-filtering the
    fan-out.
    """
    return spark.sql(
        """
        SELECT n.n_name,
               round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
                     AND s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
          AND o.o_orderdate < CAST('1997-01-01' AS TIMESTAMP_NTZ)
        GROUP BY n.n_name
        """
    )


@register(
    "sql_forecast_revenue",
    oracle="""
    SELECT round(SUM(l_extendedprice * l_discount), 4) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
    tier="P1",
)
def sql_forecast_revenue(spark, t):
    """TPC-H Q6 shape: the what-if revenue of dropping small discounts —
    a pure scan → filter → scalar aggregate with NO joins, the cleanest
    pushdown/pruning showcase in the suite. All three predicates (date
    range, discount band, quantity cap) reach the parquet scan as
    PushedFilters, only 4 of 11 columns are read, and the only exchange
    is the 1-row partial-agg merge.
    """
    return spark.sql(
        """
        SELECT round(SUM(l_extendedprice * l_discount), 4) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
          AND l_shipdate < CAST('1997-01-01' AS TIMESTAMP_NTZ)
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 24
        """
    )


@register(
    "sql_returned_item_ranking",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tier="P1",
)
def sql_returned_item_ranking(spark, t):
    """TPC-H Q10 shape: the top-20 customers by revenue lost to returned
    items in a quarter — selective fact filters (return flag + date
    window), a 4-table join, and a deterministic ranked cut (revenue
    rounded BEFORE the ORDER BY, custkey tie-break, so the top-20 edge
    is stable cross-engine).

    Plan: both filters push to their scans, nation broadcasts,
    ORDER BY+LIMIT compiles to TakeOrderedAndProject — no global sort.
    """
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, n.n_name,
               round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
          AND o.o_orderdate < CAST('1996-04-01' AS TIMESTAMP_NTZ)
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
        """
    )


@register(
    "sql_promo_revenue",
    oracle="""
    SELECT round(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
    tier="P1",
)
def sql_promo_revenue(spark, t):
    """TPC-H Q14 shape: the share of one month's revenue from PROMO
    parts — conditional aggregation over a dim join, the
    numerator-inside-denominator pattern that computes a ratio in ONE
    pass instead of two queries.

    Plan: the month filter pushes to the lineitem scan (reading ~1/72 of
    the fact table), part broadcasts, and both CASE branches fold in the
    same partial aggregate.
    """
    return spark.sql(
        """
        SELECT round(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                      THEN l.l_extendedprice * (1 - l.l_discount)
                                      ELSE 0 END)
                     / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= CAST('1996-09-01' AS TIMESTAMP_NTZ)
          AND l.l_shipdate < CAST('1996-10-01' AS TIMESTAMP_NTZ)
        """
    )


@register(
    "sql_large_volume_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           round(o.o_totalprice, 4) AS o_totalprice,
           round(t.sum_qty, 4) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 300) t
      ON o.o_orderkey = t.l_orderkey
    """,
    tier="P1",
)
def sql_large_volume_customer(spark, t):
    """TPC-H Q18 shape: orders whose total line quantity exceeds 300 —
    the HAVING-subquery-drives-the-join pattern: the lineitem aggregate
    runs FIRST (one shuffle on the order key), its small surviving set
    joins back to orders/customer. Quantity sums are integer-valued
    doubles (< 2^53), so the > 300 cut is exact on both engines.

    Plan: the aggregate's output is tiny relative to the fact table, so
    AQE flips the orders join to broadcast at runtime — the subquery is
    effectively a semi-join reducer on the fact side.
    """
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey,
               round(o.o_totalprice, 4) AS o_totalprice,
               round(t.sum_qty, 4) AS sum_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(l_quantity) > 300) t
          ON o.o_orderkey = t.l_orderkey
        """
    )


@register(
    "sql_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tier="P1",
)
def sql_customer_distribution(spark, t):
    """TPC-H Q13 shape: the distribution of customers by order count —
    INCLUDING zero-order customers, which is the whole point: the LEFT
    join preserves customers with no orders, COUNT(o_orderkey) counts
    the null as 0 (COUNT(*) would wrongly count 1), and the second
    aggregate folds per-customer counts into a |distinct counts|-row
    histogram.

    Plan: one shuffle on custkey serves both the join and the first
    aggregate; the histogram aggregate's input is |customers| rows and
    its output is tiny.
    """
    return spark.sql(
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
        """
    )


@register(
    "sql_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, round(SUM(l_extendedprice * (1 - l_discount)), 4)
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    tier="P1",
)
def sql_top_supplier(spark, t):
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue —
    a CTE consumed twice (once as the join input, once inside the
    scalar MAX subquery), the pattern that exercises Catalyst's
    handling of repeated subplans plus scalar-subquery rewriting.

    Determinism: revenue is rounded to 4 dp INSIDE the CTE, so the
    equality against the rounded MAX is exact on both engines (raw
    double sums can differ in the last ulp across engines/partition
    orders, which would make `= (SELECT MAX…)` nondeterministically
    empty — rounding first removes the knife edge; genuinely tied
    suppliers all appear, which is Q15's own semantics).
    """
    return spark.sql(
        """
        WITH rev AS (
          SELECT l_suppkey, round(SUM(l_extendedprice * (1 - l_discount)), 4)
                   AS total_rev
          FROM lineitem
          WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
            AND l_shipdate < CAST('1996-04-01' AS TIMESTAMP_NTZ)
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        """
    )
