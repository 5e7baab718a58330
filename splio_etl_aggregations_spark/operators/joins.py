"""Joins (SURVEY.md §2-C).

API surface is the single ``df.join(other, on, how)``; the physical
strategy is the planner's job (SURVEY.md §4): dims under the 10 MB
threshold broadcast (asserted in tests/test_plans.py), large-large equi
joins shuffle into sort-merge under AQE, non-equi predicates go through
BroadcastNestedLoopJoin with the small side broadcast.

Scale notes (100 TB posture):
- fact⋈dim always broadcasts the dim explicitly (`F.broadcast`) so the
  plan survives missing/stale stats on a real cluster;
- fan-out-prone multi-joins (flagship RFM) pre-aggregate each fact to
  the join key first — this both kills the row explosion and turns the
  final join into key-aligned small tables.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.helpers import net_price, r4
from ..registry import register


@register(
    "join_broadcast_equi",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand,
           round(l.l_extendedprice * (1 - l.l_discount), 4) AS net
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    tier="P0",
)
def join_broadcast_equi(spark, t):
    """Fact ⋈ small dim; explicitly broadcast → BroadcastHashJoin, no shuffle
    of the fact side."""
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_brand",
            r4(net_price()).alias("net"),
        )
    )


@register(
    "join_shuffle_equi",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_partkey, o.o_totalprice
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
    tier="P1",
)
def join_shuffle_equi(spark, t):
    """Large ⋈ large equi join: both sides shuffle on the key → sort-merge
    join; AQE may downgrade to broadcast at small SF, which is correct."""
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "l_linenumber", "l_partkey", "o_totalprice")
    )


@register(
    "join_multi_star",
    oracle="""
    SELECT n.n_name,
           round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tier="P0",
)
def join_multi_star(spark, t):
    """4-table star join + aggregate (TPC-H Q5 shape): revenue per nation.

    The fact pre-aggregates to the order key BEFORE entering the join
    chain (partial_sum map-side combine on the scan, so the big shuffle
    carries one row per order instead of one per lineitem — the same
    reduce-before-fanout discipline as the RFM flagship; measured
    1.20 s → 0.83 s warm at sf0.1, and at 100 TB the saving is the
    fact:order row ratio on the dominant exchange). Orders and customer
    then join on their keys, nation broadcasts, and the final groupBy
    is a 25-group partial+final hash agg over order-level partials.
    """
    li = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.sum(net_price()).alias("net"),
            F.count(F.lit(1)).alias("nli"),
        )
    )
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            r4(F.sum("net")).alias("revenue"),
            F.sum("nli").alias("n_lineitems"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           round(COALESCE(SUM(o.o_totalprice), 0), 4) AS spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    tier="P1",
)
def join_left_outer(spark, t):
    """Left outer with null-producing right side, null-aware post-agg."""
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            r4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("spend"),
        )
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT p.p_partkey, COUNT(l.l_orderkey) AS n_li
    FROM lineitem l RIGHT JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey
    """,
    tier="P1",
)
def join_right_outer(spark, t):
    """Right outer: every part survives, unmatched ones count 0."""
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"), "right")
        .groupBy("p_partkey")
        .agg(F.count("l_orderkey").alias("n_li"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY o_custkey
    ),
    e AS (
      SELECT user_id AS k, COUNT(*) AS n_events FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(o.k, e.k) AS custkey, o.n_orders, e.n_events
    FROM o FULL JOIN e ON o.k = e.k
    """,
    tier="P1",
)
def join_full_outer(spark, t):
    """Full outer over partially-overlapping key sets; both sides can be null."""
    o = (
        t["orders"]
        .filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    e = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return o.join(e, o["k"] == e["k"], "full").select(
        F.coalesce(o["k"], e["k"]).alias("custkey"),
        "n_orders",
        "n_events",
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    tier="P1",
)
def join_left_semi(spark, t):
    """EXISTS-style semi join: customers with ≥1 urgent order."""
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    """,
    tier="P1",
)
def join_left_anti(spark, t):
    """NOT EXISTS anti join: customers with no pending-status orders."""
    pending = t["orders"].filter(F.col("o_orderstatus") == "P")
    return (
        t["customer"]
        .join(pending, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_cross",
    oracle="SELECT n.n_name, r.r_name FROM nation n CROSS JOIN region r",
    tier="P2",
)
def join_cross(spark, t):
    """Cartesian product of two tiny dims (25 × 5)."""
    return t["nation"].crossJoin(t["region"]).select("n_name", "r_name")


@register(
    "join_theta_range",
    oracle="""
    SELECT p.p_partkey, b.band
    FROM part p
    JOIN (VALUES ('b0', 0.0, 1000.0),
                 ('b1', 1000.0, 1400.0),
                 ('b2', 1400.0, 1800.0),
                 ('b3', 1800.0, 1000000.0)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    """,
    tier="P2",
)
def join_theta_range(spark, t):
    """Non-equi banded join → BroadcastNestedLoopJoin with the tiny band
    table broadcast (the only sane physical plan for theta joins)."""
    bands = spark.createDataFrame(
        [
            ("b0", 0.0, 1000.0),
            ("b1", 1000.0, 1400.0),
            ("b2", 1400.0, 1800.0),
            ("b3", 1800.0, 1000000.0),
        ],
        "band string, lo double, hi double",
    )
    p = t["part"]
    return p.join(
        F.broadcast(bands),
        (p["p_retailprice"] >= bands["lo"]) & (p["p_retailprice"] < bands["hi"]),
    ).select("p_partkey", "band")


@register(
    "join_self_sequence",
    oracle="""
    SELECT e1.event_id, MIN(e2.ts) AS next_ts
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    GROUP BY e1.event_id
    """,
    tier="P2",
)
def join_self_sequence(spark, t):
    """Self theta join on time: each event's next same-user event within 1 h.

    Equi part (user_id) carries the shuffle; the time band is a residual
    predicate on the sort-merge join — no cartesian blow-up.
    """
    e1 = t["events"].alias("e1")
    e2 = t["events"].alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.ts") > F.col("e1.ts"))
            & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("e1.event_id").alias("event_id"))
        .agg(F.min(F.col("e2.ts")).alias("next_ts"))
    )


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id, c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tier="P2",
)
def join_asof(spark, t):
    """As-of join (no native Spark operator): for each purchase event, the
    same user's latest click at-or-before it.

    Composed as a MERGE-STREAM window — the linear formulation: union the
    click and purchase streams, sort each user's timeline once, take the
    ignore-nulls ``last`` click timestamp over the preceding rows frame.
    Equal-timestamp ties sort clicks (tag 0) before purchases (tag 1), so
    a click at exactly the purchase instant counts — the ≤ semantics of
    DuckDB's native ASOF LEFT JOIN.

    Round 1 composed this as equi-join on user + time filter + max();
    correct, and at these fixture scales the two forms measure the same
    (sub-second, noise-bound, probed at sf0.1×{1,3,10}) because codegen
    chews the join fan-out map-side before any shuffle. The window form
    still wins structurally: the join form materializes
    |purchases/user| × |preceding clicks| intermediate rows — quadratic
    in per-user history depth, the term that detonates on multi-year
    100 TB histories — where the merge-stream is one user_id exchange +
    one per-user sort, O(n log n) whatever the history shape (the
    ``attribution_last_touch`` mechanism).
    """
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("c_ts"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast(ev.schema["ts"].dataType).alias("c_ts"),
        F.lit(1).alias("tag"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select("event_id", "last_click_ts")
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    tier="P2",
)
def join_bucketed_colocated(spark, t):
    """Shuffle-free large⋈large join via bucketing — the 100 TB answer to
    repeated fact⋈fact joins on the same key.

    Both sides are written bucketed (8 buckets) and sorted on the join
    key; reading them back, Spark aligns bucket i with bucket i and
    sort-merge-joins with NO Exchange on either side (asserted in
    tests/test_plans.py — the only Exchange left in the plan belongs to
    the final small aggregation). At warehouse scale the bucketed write
    happens once at ingest and every subsequent join on that key is
    co-located.
    """
    import os
    import shutil
    from urllib.parse import urlparse

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # A fresh session's in-memory catalog doesn't know tables left in the
    # warehouse dir by a previous session — drop both layers explicitly.
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    t["orders"].select("o_orderkey", "o_orderpriority").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("bkt_orders")
    t["lineitem"].select(
        "l_orderkey",
        F.round(net_price() * 100).cast("bigint").alias("net_cents"),
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("bkt_lineitem")
    o = spark.table("bkt_orders")
    l = spark.table("bkt_lineitem")
    # hint("merge"): at fixture scale the planner would broadcast instead
    # (both sides under the 10 MB threshold), which hides the bucketed
    # path this operator exists to exercise; at 100 TB SMJ is what the
    # planner picks anyway, and bucketing removes its exchanges.
    return (
        o.hint("merge")
        .join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # exact integer-cent fold: at sf0.1 the 4-dp round of a ~6e9
            # double sum sat on the association-dependent last ulp (r3
            # sf0.1 sweep); per-row cents are bit-identical cross-engine
            F.sum("net_cents").alias("revenue_cents"),
        )
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT e.event_id, CAST(d.weight AS DOUBLE) AS weight,
           round(e.value * d.weight, 4) AS weighted_value
    FROM events e
    JOIN (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
                 ('signup', 5.0), ('error', 0.0)) AS d(event_type, weight)
      ON e.event_type = d.event_type
    """,
    tier="P2",
)
def join_salted_skew(spark, t):
    """Hot-key join neutralized by salting: every fact row joins a 5-row
    dim on event_type — each dim key's fan-in is ~20 % of the table, the
    worst-case shuffle-join skew shape.

    The fact side gets salt = hash(event_id) % 16; the dim side is
    replicated ×16 (a 5×16 = 80-row explode, still broadcastable); the
    join key becomes (event_type, salt), so each hot key spreads over 16
    reducers. Identical output to the unsalted join — the hash-check
    proves it. (With a broadcastable dim, salting is moot — Spark never
    shuffles the fact — so this operator force-disables broadcast via a
    shuffle-hash hint to exercise the real shuffle-join path salting
    exists for.)
    """
    n_salt = 16
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0),
         ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    salted_dim = dim.select(
        "event_type",
        "weight",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])).alias("salt"),
    )
    fact = t["events"].withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salt)).cast("int")
    )
    return (
        fact.hint("shuffle_hash")
        .join(salted_dim, ["event_type", "salt"])
        .select(
            "event_id",
            "weight",
            F.round(F.col("value") * F.col("weight"), 4).alias("weighted_value"),
        )
    )


@register(
    "join_lateral_topn",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 4) AS o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    """,
    tier="P2",
)
def join_lateral_topn(spark, t):
    """Top-2 orders per customer via a correlated LATERAL subquery — the
    SQL-surface twin of ``win_topk_per_group``.

    Catalyst rewrites the correlated LATERAL limit into the same
    window/join shape the DataFrame form compiles to (DecorrelateInnerQuery)
    rather than re-executing the subquery per row; DuckDB runs the
    identical SQL for the hash-check.
    """
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey,
               round(o.o_totalprice, 4) AS o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        """
    )


@register(
    "join_interval_overlap",
    oracle="""
    SELECT e.event_id, CAST(COUNT(w.lo) AS BIGINT) AS n_overlap
    FROM events e LEFT JOIN (
      SELECT ts - INTERVAL 10 MINUTE AS lo, ts + INTERVAL 10 MINUTE AS hi
      FROM events WHERE event_type = 'error'
    ) w ON e.ts >= w.lo AND e.ts < w.hi
    GROUP BY e.event_id
    """,
    tier="P2",
)
def join_interval_overlap(spark, t):
    """Per-event count of overlapping error windows (each 'error' event
    opens a ±10-minute outage interval) — an interval-overlap join where
    BOTH sides are data-proportional and there is no equi key.

    The naive form is a range-only theta join: O(n·m) compares and, in
    Spark, a BroadcastNestedLoopJoin that stops being sane the moment
    the interval side outgrows a broadcast. The scale form used here is
    epoch bucketing, the standard distributed interval-join decomposition:
    chop time into fixed buckets the size of the interval radius, expand
    each interval to the 2-3 buckets it touches (a bounded fan-out,
    sequence() on bucket ids), tag each event with its single containing
    bucket, and equi-join on bucket id before the exact range predicate.
    Every (event, window) overlap shares the event's bucket by
    construction, so the equi-join loses nothing — and Catalyst gets a
    shuffle-hash-joinable key whose skew follows the event-time
    distribution (burst seconds can further salt the bucket id).
    """
    us_per_bucket = 600 * 1_000_000  # 10 min of microseconds
    ev = t["events"].select(
        "event_id", F.unix_micros("ts").alias("us")
    ).withColumn("bucket", F.floor(F.col("us") / us_per_bucket))
    err = (
        t["events"]
        .filter(F.col("event_type") == "error")
        .select(F.unix_micros("ts").alias("e_us"))
        .select(
            (F.col("e_us") - us_per_bucket).alias("lo"),
            (F.col("e_us") + us_per_bucket).alias("hi"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("lo") / us_per_bucket),
                    F.floor((F.col("hi") - 1) / us_per_bucket),
                )
            ),
        )
    )
    hits = (
        ev.join(
            err,
            (ev["bucket"] == err["bucket"])
            & (ev["us"] >= err["lo"])
            & (ev["us"] < err["hi"]),
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        t["events"]
        .select("event_id")
        .join(hits, "event_id", "left")
        .select("event_id", F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"))
    )


@register(
    "join_null_safe_equi",
    oracle="""
    WITH c AS (
      SELECT c_custkey, nullif(c_nationkey, 0) AS nk FROM customer
    ),
    n AS (
      SELECT nullif(n_nationkey, 0) AS nk, n_name FROM nation
    )
    SELECT c.c_custkey, n.n_name
    FROM c JOIN n ON c.nk IS NOT DISTINCT FROM n.nk
    """,
    tier="P2",
)
def join_null_safe_equi(spark, t):
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): nation
    key 0 is nulled on both sides, and the null-safe predicate still
    matches those rows to each other — the semantic a plain equi-join
    silently drops (NULL = NULL is never true). The practical shape for
    joining on nullable business keys without COALESCE sentinels.

    Spark plans ``<=>`` as a hash join (the null bucket hashes like any
    other key), so the scale posture is identical to ``join_shuffle_equi``.
    """
    c = t["customer"].select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk")
    )
    n = t["nation"].select(
        F.nullif(F.col("n_nationkey"), F.lit(0)).alias("nk"), "n_name"
    )
    return c.join(F.broadcast(n), c["nk"].eqNullSafe(n["nk"])).select(
        "c_custkey", "n_name"
    )


@register(
    "graph_triangle_count",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    e AS (
      SELECT a.brand AS src, b.brand AS dst
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    ),
    tri AS (
      SELECT COUNT(*)::BIGINT AS n_triangles
      FROM e e1
      JOIN e e2 ON e2.src = e1.dst
      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    )
    SELECT (SELECT COUNT(*) FROM (SELECT DISTINCT src FROM e
                                  UNION SELECT DISTINCT dst FROM e))::BIGINT
             AS n_nodes,
           (SELECT COUNT(*) FROM e)::BIGINT AS n_edges,
           n_triangles
    FROM tri
    """,
    tier="P3",
)
def graph_triangle_count(spark, t):
    """Triangle counting on the brand co-occurrence graph (edges =
    brand pairs sharing ≥5 orders): the classic distributed graph
    metric behind clustering-coefficient and community detection.

    Edges are ORIENTED low→high before the two-hop join, so every
    triangle a<b<c is enumerated exactly once and the join fan-out is
    bounded by out-degree under the orientation — the standard trick
    that makes distributed triangle counting feasible (an unoriented
    edge join counts each triangle 6x and explodes on hub nodes).
    Here the graph is |brands|-sized after the fact-table reduction, so
    the edge joins broadcast.
    """
    ob = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
        .distinct()
    )
    a, b = ob.alias("a"), ob.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(F.col("a.brand").alias("src"), F.col("b.brand").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 5)
        .select("src", "dst")
        .localCheckpoint(eager=False)  # three self-join consumers
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("src").alias("n"))
        .union(e.select("dst"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    edges = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        nodes.crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    b AS (SELECT p.event_id, max(c.ts) AS ts
          FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
          GROUP BY p.event_id),
    f AS (SELECT p.event_id, min(c.ts) AS ts
          FROM p JOIN c ON p.user_id = c.user_id AND c.ts > p.ts
          GROUP BY p.event_id)
    SELECT p.event_id,
           CASE WHEN b.ts IS NOT NULL
                     AND (f.ts IS NULL
                          OR epoch_us(p.ts) - epoch_us(b.ts)
                             <= epoch_us(f.ts) - epoch_us(p.ts))
                THEN b.ts ELSE f.ts END AS nearest_click_ts,
           CASE WHEN b.ts IS NOT NULL
                     AND (f.ts IS NULL
                          OR epoch_us(p.ts) - epoch_us(b.ts)
                             <= epoch_us(f.ts) - epoch_us(p.ts))
                THEN epoch_us(p.ts) - epoch_us(b.ts)
                ELSE epoch_us(f.ts) - epoch_us(p.ts) END AS diff_us,
           CASE WHEN b.ts IS NOT NULL
                     AND (f.ts IS NULL
                          OR epoch_us(p.ts) - epoch_us(b.ts)
                             <= epoch_us(f.ts) - epoch_us(p.ts))
                THEN 'backward'
                WHEN f.ts IS NOT NULL THEN 'forward'
                ELSE NULL END AS direction
    FROM p LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
    """,
    tier="P2",
)
def join_asof_nearest(spark, t):
    """Nearest-neighbor as-of join, both directions: for each purchase,
    the same user's click closest in time — before OR after — plus the
    exact-µs distance and which side won (ties at equal distance go
    backward, the causally-safe side). The backward-only form
    (``join_asof``) answers attribution; the nearest form is what
    sensor/telemetry alignment needs, where the closest reading matters
    regardless of direction.

    Composed as ONE merge-stream window pass (the linear as-of
    formulation, see ``join_asof``): union the tagged click and purchase
    streams, sort each user's timeline once, and read both neighbors
    from the same window spec — ignore-nulls ``last`` click over the
    preceding frame and ignore-nulls ``first`` click over the strictly-
    following frame. Equal-timestamp clicks sort before purchases, so ≤
    lands in the backward frame and > in the forward one — exactly the
    two directional oracles. Purchases with no click survive with NULL
    (the contract a plain inner range-join silently breaks). Distance
    arithmetic is integer microseconds (``unix_micros``/``epoch_us``) —
    never float seconds, whose rounding can flip the winner at equal
    distances.

    Scale: one shuffle on user_id + one per-user sort serving both
    directions — O(n log n) in history depth, where the join+aggregate
    form is quadratic (fan-out |purchases/user| × |clicks in range|).
    """
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("c_ts"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast(ev.schema["ts"].dataType).alias("c_ts"),
        F.lit(1).alias("tag"),
        "event_id",
    )
    spec = Window.partitionBy("user_id").orderBy("ts", "tag")
    w_back = spec.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = spec.rowsBetween(1, Window.unboundedFollowing)
    merged = (
        clicks.unionByName(purchases)
        .select(
            "event_id",
            "ts",
            F.last("c_ts", ignorenulls=True).over(w_back).alias("b_ts"),
            F.first("c_ts", ignorenulls=True).over(w_fwd).alias("f_ts"),
        )
        .filter(F.col("event_id").isNotNull())
    )
    d_back = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    d_fwd = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    take_back = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (d_back <= d_fwd)
    )
    return merged.select(
        "event_id",
        F.when(take_back, F.col("b_ts")).otherwise(F.col("f_ts")).alias(
            "nearest_click_ts"
        ),
        F.when(take_back, d_back).otherwise(d_fwd).alias("diff_us"),
        F.when(take_back, F.lit("backward"))
        .when(F.col("f_ts").isNotNull(), F.lit("forward"))
        .otherwise(F.lit(None).cast("string"))
        .alias("direction"),
    )


#: pagerank iteration count / damping factor (fixed so both engines run
#: the identical finite computation — no data-dependent convergence test)
_PR_ITERS = 5
_PR_DAMP = 0.85


def _pagerank_oracle() -> str:
    """Unrolled-CTE DuckDB oracle: the same fixed 5 power iterations."""
    head = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
e AS (
  SELECT a.brand AS src, b.brand AS dst
  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM sym GROUP BY 1),
nn AS (SELECT COUNT(*)::DOUBLE AS n FROM deg),
r0 AS (SELECT node, outdeg, 1.0 / (SELECT n FROM nn) AS pr FROM deg)"""
    its = []
    for i in range(1, _PR_ITERS + 1):
        its.append(
            f""",
r{i} AS (
  SELECT d.node, d.outdeg,
         {1 - _PR_DAMP} / (SELECT n FROM nn)
           + {_PR_DAMP} * SUM(r.pr / r.outdeg) AS pr
  FROM sym s
  JOIN r{i - 1} r ON r.node = s.src
  JOIN deg d ON d.node = s.dst
  GROUP BY d.node, d.outdeg
)"""
        )
    return (
        head
        + "".join(its)
        + f"\nSELECT node AS brand, round(pr, 6) AS pagerank FROM r{_PR_ITERS}"
    )


@register("graph_pagerank", oracle=_pagerank_oracle(), tier="P3")
def graph_pagerank(spark, t):
    """PageRank over the brand co-occurrence graph (edges = brand pairs
    sharing ≥5 orders, symmetrized): 5 fixed power iterations at damping
    0.85 — the iterative-algorithm representative alongside label
    propagation (``dedup_connected_components``), proving the engine
    hosts fixed-point graph computations as plain DataFrame loops.

    Determinism policy for an iterative float algorithm: the iteration
    count is FIXED (never a data-dependent convergence test, which can
    diverge between engines on the last ulp), intermediate ranks stay
    raw doubles, and only the final output rounds (6 dp). The oracle
    unrolls the same 5 iterations as CTEs.

    Scale: each iteration is one contributions join (shuffle keyed on
    the edge src — at real scale pre-partition ``sym`` by src once and
    every iteration reuses that layout exchange-free) + one dst-keyed
    aggregate; rank state is |nodes| rows, never materialized to the
    driver. The edge/degree frames are cached once (multiple consumers);
    the 5-iteration rank lineage stays untruncated so the fixed point
    compiles as one dataflow (measured at sf0.1: 3.7 s with lazy
    per-frame localCheckpoint — whose build-time physical-plan compile
    alone cost 5.3 s cold — vs 2.3 s warm with cache). Past ~20
    iterations (label propagation, dedup.py) periodic checkpoints become
    the right trade again to bound re-planning. Dangling-node mass is
    structurally
    absent here (symmetrized graph ⇒ every node has out-degree ≥ 1);
    a directed-graph deployment adds the standard dangling-sum
    redistribution term.
    """
    ob = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
    )
    # one-pass edge build: per-order brand set → i<j half-pairs via
    # posexplode+slice (the aliased self-join shuffled the fact twice;
    # this shuffles it once — same rewrite as basket_brand_affinity /
    # rec_item_item_cf)
    e = (
        ob.groupBy("okey")
        .agg(F.sort_array(F.collect_set("brand")).alias("brands"))
        .select(F.posexplode("brands").alias("pos", "src"), "brands")
        .select(
            "src",
            F.explode(F.slice("brands", F.col("pos") + 2, 64)).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 5)
        .select("src", "dst")
    )
    # cache, not localCheckpoint: lazy localCheckpoint compiles the
    # physical plan at BUILD time (measured 5.3 s on this subtree), while
    # cache defers everything and still computes the edge build once for
    # all 5 iterations' lineages
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    deg = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .withColumnRenamed("src", "node")
        .cache()
    )
    nn = deg.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    teleport = F.lit(1 - _PR_DAMP) / F.col("n_nodes")
    ranks = deg.crossJoin(F.broadcast(nn)).select(
        "node", "outdeg", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("pr")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            sym.join(ranks, F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
        )
        # contrib IS the next spine: the symmetrized graph gives every
        # node an in-edge, so no node drops out (matches the oracle's
        # inner joins); one broadcast join per iteration, n_nodes rides
        # along as a column instead of a per-iteration crossJoin subtree
        ranks = contrib.join(F.broadcast(deg), F.col("dst") == F.col("node")).crossJoin(
            F.broadcast(nn)
        ).select(
            "node",
            "outdeg",
            "n_nodes",
            (teleport + F.lit(_PR_DAMP) * F.col("c")).alias("pr"),
        )
    return ranks.select(
        F.col("node").alias("brand"), F.round("pr", 6).alias("pagerank")
    )


@register(
    "graph_link_prediction",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    w AS (
      SELECT a.brand AS src, b.brand AS dst, COUNT(*) AS w
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2
    ),
    tot AS (SELECT COUNT(*) AS n, SUM(CAST(w AS BIGINT)) AS s FROM w),
    e AS (
      SELECT src, dst FROM w, tot WHERE w * n * 20 >= 21 * s
    ),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY 1),
    cn AS (
      SELECT x.src AS a, y.dst AS b, COUNT(*) AS n_common
      FROM sym x JOIN sym y ON x.dst = y.src AND x.src < y.dst
      GROUP BY x.src, y.dst
    ),
    nonedge AS (
      SELECT cn.a, cn.b, cn.n_common
      FROM cn
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = cn.a AND e.dst = cn.b)
    )
    SELECT n.a AS brand_a, n.b AS brand_b, n.n_common,
           round(n.n_common * 1.0 / (da.d + db.d - n.n_common), 6)
             AS jaccard_score
    FROM nonedge n
    JOIN deg da ON da.node = n.a
    JOIN deg db ON db.node = n.b
    ORDER BY jaccard_score DESC, brand_a, brand_b
    LIMIT 10
    """,
    tier="P3",
)
def graph_link_prediction(spark, t):
    """Common-neighbor link prediction on the brand co-occurrence graph:
    for brand pairs NOT currently connected, score the missing link by
    neighborhood Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| and return the top-10
    predictions — the "brands that should co-sell but don't yet"
    recommendation primitive, and the third graph-analytics
    representative beside triangle counting and PageRank.

    An edge is a pair whose co-occurrence weight is ≥ 1.05× the mean
    pair weight — data-RELATIVE, because any fixed absolute threshold
    either saturates the graph (the r1–r3 ``w ≥ 5`` rule made it
    complete at every fixture scale, so the non-edge output was
    vacuously empty — caught by the r4 zero-row oracle audit) or
    empties it as the corpus grows. The comparison runs as pure integer
    arithmetic (``w·n·20 ≥ 21·Σw``), so both engines cut identically
    with no float-boundary risk.

    Common neighbors come from the two-hop self-join on the symmetrized
    edge list (a<b orientation so each candidate pair appears once);
    existing edges are removed with an anti-join; degrees join in from
    the |nodes|-row degree table; the ranked cut rounds the score BEFORE
    ordering with (brand_a, brand_b) tie-breaks. Everything after the
    fact-table reduction is |brands|-bounded, so the joins broadcast and
    the top-10 is a TakeOrderedAndProject.
    """
    ob = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
        .distinct()
    )
    a, b = ob.alias("a"), ob.alias("b")
    wts = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(F.col("a.brand").alias("src"), F.col("b.brand").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .cache()
    )
    # the (n, Σw) totals collect ONE row of the |brand-pairs|-bounded
    # weight frame (≤ |brands|² ≈ hundreds) — the same bounded-scalar
    # pattern as the IVF probe aggregates; inlining them as literals
    # keeps the cached edge frame's stored plan free of a crossJoin
    # subtree that every downstream reuse would reprint
    n, s = wts.agg(F.count(F.lit(1)), F.sum("w")).collect()[0]
    e = (
        wts.filter(F.col("w") * int(n) * 20 >= 21 * int(s))
        .select("src", "dst")
        .cache()
    )
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed(
        "src", "node"
    )
    x, y = sym.alias("x"), sym.alias("y")
    cn = (
        x.join(
            y,
            (F.col("x.dst") == F.col("y.src"))
            & (F.col("x.src") < F.col("y.dst")),
        )
        .groupBy(F.col("x.src").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    nonedge = cn.join(
        e,
        (F.col("a") == F.col("src")) & (F.col("b") == F.col("dst")),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    score = F.round(
        F.col("n_common") / (F.col("da") + F.col("db") - F.col("n_common")), 6
    )
    return (
        nonedge.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.col("a").alias("brand_a"),
            F.col("b").alias("brand_b"),
            "n_common",
            score.alias("jaccard_score"),
        )
        .orderBy(F.desc("jaccard_score"), "brand_a", "brand_b")
        .limit(10)
    )


@register(
    "rec_item_item_cf",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT brand, COUNT(*) AS cnt FROM ob GROUP BY brand),
    co AS (
      SELECT a.brand AS ba, b.brand AS bb, COUNT(*) AS co_cnt
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand <> b.brand
      GROUP BY a.brand, b.brand
    ),
    scored AS (
      SELECT co.ba AS brand, co.bb AS similar_brand,
             round(co.co_cnt / sqrt(na.cnt * nb.cnt), 6) AS cosine_sim,
             row_number() OVER (
               PARTITION BY co.ba
               ORDER BY round(co.co_cnt / sqrt(na.cnt * nb.cnt), 6) DESC,
                        co.bb) AS rn
      FROM co
      JOIN n na ON na.brand = co.ba
      JOIN n nb ON nb.brand = co.bb
    )
    SELECT brand, similar_brand, cosine_sim, CAST(rn AS BIGINT) AS rank
    FROM scored WHERE rn <= 5
    """,
    tier="P2",
)
def rec_item_item_cf(spark, t):
    """Item-item collaborative filtering over the order×brand incidence
    matrix: cosine similarity between brand columns
    (co(a,b)/√(n(a)·n(b))) and each brand's top-5 most-similar brands —
    the "customers who bought X also bought" primitive, computed the
    way production recommenders do it (co-occurrence join, never the
    dense matrix).

    Scale shape: co-occurrence comes from ONE pass over the fact — the
    per-order brand set (collect_set, bounded by basket width) double-
    explodes into the i<j half-pairs, which mirror into the symmetric
    pair table JVM-side (the aliased self-join form re-ran the
    scan+distinct subtree per side and shuffled the fact twice; this
    plan shuffles it once, same rewrite as ``basket_brand_affinity``).
    The per-brand counts table is catalog-sized and broadcasts; top-5
    ranks inside |brand| partitions on the ROUNDED score with a brand
    tie-break, so the cut is deterministic cross-engine. At 100 TB
    co-occurrence pairs also get a min-support floor (see
    ``basket_brand_affinity``) to keep the pair table sparse.
    """
    from pyspark.sql import Window

    ob = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
    )
    # collect_set dedupes per order (replacing the standalone DISTINCT
    # shuffle); localCheckpoint because three consumers read this frame
    # and exchange reuse does not span them (same pattern + measurement
    # as basket_brand_affinity)
    per_order = (
        ob.groupBy("okey")
        .agg(F.sort_array(F.collect_set("brand")).alias("brands"))
        .localCheckpoint(eager=False)
    )
    n = (
        per_order.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    half = (
        per_order.select(
            F.posexplode("brands").alias("pos", "ba"), "brands"
        )
        .select(
            "ba",
            F.explode(F.slice("brands", F.col("pos") + 2, 64)).alias("bb"),
        )
        .groupBy("ba", "bb")
        .agg(F.count(F.lit(1)).alias("co_cnt"))
    )
    # cosine is symmetric: mirror the |brands|²-bounded half-pair frame
    # instead of generating both directions from the fact
    co = half.unionByName(
        half.select(
            F.col("bb").alias("ba"), F.col("ba").alias("bb"), "co_cnt"
        )
    )
    na = n.select(F.col("brand").alias("ba"), F.col("cnt").alias("na"))
    nb = n.select(F.col("brand").alias("bb"), F.col("cnt").alias("nb"))
    sim = F.round(
        F.col("co_cnt") / F.sqrt(F.col("na") * F.col("nb")), 6
    )
    return (
        co.join(F.broadcast(na), "ba")
        .join(F.broadcast(nb), "bb")
        .select(
            F.col("ba").alias("brand"),
            F.col("bb").alias("similar_brand"),
            sim.alias("cosine_sim"),
        )
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("brand").orderBy(
                    F.desc("cosine_sim"), F.asc("similar_brand")
                )
            )
            .cast("bigint"),
        )
        .filter(F.col("rank") <= 5)
    )


@register(
    "join_fuzzy_name",
    oracle="""
    WITH names AS (
      SELECT p_name, COUNT(*) AS n_parts,
             string_split(p_name, ' ')[-1] AS block
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_lo, b.p_name AS name_hi,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
           a.n_parts AS n_parts_lo, b.n_parts AS n_parts_hi
    FROM names a
    JOIN names b ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    tier="P2",
)
def join_fuzzy_name(spark, t):
    """Fuzzy entity-resolution join: near-identical part names
    (Levenshtein ≤ 3) found WITHOUT the all-pairs cross join — the
    master-data-management dedup primitive ("old bolt" vs "red bolt"
    are one typo apart; are they the same product?).

    The blocked-join shape production MDM uses: candidates must share a
    blocking key (here the head noun — the name's last token) before
    the quadratic edit-distance runs, so comparisons are
    |block-bucket|² instead of |catalog|²; the name table is first
    collapsed to DISTINCT names with usage counts, bounding everything
    by vocabulary rather than row count. Levenshtein is exact integer
    arithmetic — identically defined on both engines, no rounding
    policy needed.
    """
    names = (
        t["part"]
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn(
            "block", F.element_at(F.split("p_name", " "), -1)
        )
    )
    a = names.select(
        F.col("p_name").alias("name_lo"),
        F.col("n_parts").alias("n_parts_lo"),
        F.col("block").alias("block_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_hi"),
        F.col("n_parts").alias("n_parts_hi"),
        F.col("block").alias("block_b"),
    )
    dist = F.levenshtein("name_lo", "name_hi")
    return (
        a.join(
            b,
            (F.col("block_a") == F.col("block_b"))
            & (F.col("name_lo") < F.col("name_hi")),
        )
        .filter(dist <= 3)
        .select(
            "name_lo",
            "name_hi",
            dist.cast("bigint").alias("edit_dist"),
            "n_parts_lo",
            "n_parts_hi",
        )
    )


@register(
    "graph_degree_distribution",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1
      JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
      WHERE l1.l_partkey <> l2.l_partkey
    ),
    deg AS (
      SELECT a, COUNT(*) AS degree FROM pairs GROUP BY a
    )
    SELECT CAST(length(bin(degree)) - 1 AS INT) AS log2_bucket,
           COUNT(*) AS n_parts,
           MIN(degree) AS min_degree,
           MAX(degree) AS max_degree
    FROM deg
    GROUP BY 1
    ORDER BY 1
    """,
    tier="P3",
)
def graph_degree_distribution(spark, t):
    """Degree distribution of the co-purchase graph (parts are nodes,
    an edge = the two parts appear on the same order) in log2 buckets —
    the first thing to look at before running any graph algorithm on
    purchase data: a heavy-tailed degree histogram says "salt the hub
    nodes" for everything downstream (cf. ``join_salted_skew``).

    The self-join is keyed on the order, so its blow-up is bounded by
    lines-per-order² (TPC-H ≤ 7 lines ⇒ ≤ 42 directed pairs per order)
    — never all-pairs over parts. Bucket ids use bit-length arithmetic
    (``length(bin(d)) - 1``), not ``floor(log2(d))``: ln(8)/ln(2) is
    2.999… in binary floating point and floors to the wrong bucket on
    exact powers of two, and the two engines need not err identically.
    """
    li = t["lineitem"].select("l_orderkey", "l_partkey")
    # Round-robin repartition of the PROBE side before the fan-out (r8
    # optimization round, guide §2.5 "input skew ... repartition
    # immediately after the read"): the fixtures ship ONE parquet row
    # group per table, so scan parallelism is hard-capped at 1 task and
    # the 4x pair fan-out + partial pair-distinct otherwise run
    # single-threaded (measured 4.5 s -> 2.7 s warm at sf0.1). The
    # repartition is NOT free — it is a full extra exchange of the
    # 2-column projection — so it is gated on the scan actually being
    # starved (observed partitions < half the cores; r9, VERDICT r8
    # item 6): on splittable 100 TB input the scan already fans out and
    # the gate leaves the plan exchange-free up to the join.
    par = spark.sparkContext.defaultParallelism
    probe = li.repartition(par) if li.rdd.getNumPartitions() < max(2, par // 2) else li
    pairs = (
        probe.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") != F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .distinct()
    )
    deg = pairs.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy(
            (F.length(F.bin("degree")) - 1).cast("int").alias("log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
        )
        .orderBy("log2_bucket")
    )


@register(
    "graph_kcore_peel",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity <= 8
    ),
    e0 AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM base l1 JOIN base l2 ON l1.l_orderkey = l2.l_orderkey
      WHERE l1.l_partkey <> l2.l_partkey
    ),
    d0 AS (SELECT a, COUNT(*) AS deg FROM e0 GROUP BY a),
    k0 AS (SELECT a FROM d0 WHERE deg >= 4),
    e1 AS (SELECT e.a, e.b FROM e0 e
           JOIN k0 x ON e.a = x.a JOIN k0 y ON e.b = y.a),
    d1 AS (SELECT a, COUNT(*) AS deg FROM e1 GROUP BY a),
    k1 AS (SELECT a FROM d1 WHERE deg >= 4),
    e2 AS (SELECT e.a, e.b FROM e1 e
           JOIN k1 x ON e.a = x.a JOIN k1 y ON e.b = y.a),
    d2 AS (SELECT a, COUNT(*) AS deg FROM e2 GROUP BY a),
    k2 AS (SELECT a FROM d2 WHERE deg >= 4),
    e3 AS (SELECT e.a, e.b FROM e2 e
           JOIN k2 x ON e.a = x.a JOIN k2 y ON e.b = y.a)
    SELECT a AS part_node, COUNT(*) AS induced_degree
    FROM e3 GROUP BY a
    """,
    tier="P3",
)
def graph_kcore_peel(spark, t):
    """Bounded k-core decomposition (k=4, 3 peel rounds) of the sparse
    co-purchase graph — the dense-community extractor that feeds
    recommendation candidate generation: nodes that survive repeated
    "drop everything with induced degree < k" rounds form the stable
    core; the long tail peels off.

    The full co-purchase graph is so dense every node sits in a deep
    core (min degree > 16 at every fixture scale — nothing would ever
    peel), so the edge set is sparsified first to small-quantity lines
    (l_quantity ≤ 8), which preserves the power-law shape while giving
    the peel real work: 183→60→21→5 surviving nodes across the three
    rounds at sf0.001, 17 936→…→1 800 at sf0.1.

    Spark shape: the iteration is UNROLLED (3 fixed rounds, same plan
    every run — no driver-side convergence loop), and each round is one
    groupBy degree count + two LEFT SEMI joins against the survivor
    set, with a ``localCheckpoint`` lineage cut per round — the same
    posture as ``graph_pagerank``: each round's edge set feeds THREE
    downstream consumers (the degree count and both semi-join probes),
    so without the cut the logical plan re-derives the parent round
    three times per level (3^rounds growth — the first draft's plan
    signature showed 108 parquet scans; with the cut it is one scan
    plus three small in-memory rounds). Survivor sets shrink
    monotonically and AQE turns the semi joins into broadcasts as soon
    as they fit; edge blow-up stays bounded by lines-per-order² exactly
    as ``graph_degree_distribution`` argues. At 100 TB three fixed
    rounds remove the overwhelming majority of peelable nodes on
    power-law graphs (peeling converges geometrically) and keep the
    materialized state to one (shrinking) edge list per round.
    """
    k = 4
    base = t["lineitem"].filter(F.col("l_quantity") <= 8).select(
        "l_orderkey", "l_partkey"
    )
    edges = (
        base.alias("x")
        .join(base.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") != F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    for _ in range(3):
        deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("a")
        edges = (
            edges.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint()
        )
    return edges.groupBy(F.col("a").alias("part_node")).agg(
        F.count(F.lit(1)).alias("induced_degree")
    )


@register(
    "join_accumulating_snapshot",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(MIN(l.l_shipdate) AS DATE) AS first_ship,
           CAST(MAX(l.l_shipdate) AS DATE) AS last_ship,
           COUNT(*) AS n_lines,
           CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                         CAST(MIN(l.l_shipdate) AS DATE)) AS BIGINT)
             AS days_to_first_ship
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 100 < 10
    GROUP BY o.o_orderkey, o.o_orderstatus, o.o_orderdate
    ORDER BY o.o_orderkey
    """,
    tier="P2",
)
def join_accumulating_snapshot(spark, t):
    """Accumulating-snapshot fact row per order: the Kimball lifecycle
    pattern where one row carries every milestone date (order placed,
    first ship, last ship) and the lag between them — the table a
    fulfillment dashboard reads instead of re-joining lineitem each
    query. Restricted to a 10 % key slice to bound the compare payload;
    the plan is keyed on the order key so the filter is a knob.

    One fact⋈fact join on the order key and one grouped fold — the
    milestone MIN/MAX are plain aggregates, and at 100 TB this is the
    incremental-refresh target ``etl_upsert_merge`` would maintain.
    """
    o = t["orders"].filter(F.col("o_orderkey") % 100 < 10)
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .agg(
            F.min(F.col("l_shipdate").cast("date")).alias("first_ship"),
            F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            "order_date",
            "first_ship",
            "last_ship",
            "n_lines",
            F.datediff("first_ship", "order_date")
            .cast("bigint")
            .alias("days_to_first_ship"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_role_playing_dates",
    oracle="""
    SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
           CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
           COUNT(*) AS n_lines,
           round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tier="P2",
)
def join_role_playing_dates(spark, t):
    """Role-playing date dimension: the same calendar plays two roles —
    order month and ship month — giving the (ordered-in, shipped-in)
    lag matrix a fulfillment planner reads diagonally (on-diagonal =
    shipped same month; each step right = one month of backlog). The
    Kimball pattern this demonstrates is that BOTH roles conform to one
    date dimension, so the matrix needs no second calendar table —
    just two independent truncations of the conformed grain.

    One fact join on the order key, a (months × months) bounded group
    — at 100 TB the matrix is still ≤ a few hundred cells.
    """
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        )
        .join(
            t["lineitem"].select(
                "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))),
                4,
            ).alias("revenue"),
        )
        .orderBy("order_month", "ship_month")
    )


@register(
    "join_bloom_prune",
    oracle="""
    SELECT l.l_returnflag, COUNT(*) AS n_lines,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
    tier="P2",
)
def join_bloom_prune(spark, t):
    """Runtime bloom-filter join pruning: the filtered dimension's keys
    fold into an O(bits) bloom filter that Catalyst injects as a
    ``might_contain`` predicate on the FACT side *before* its shuffle —
    rows that can't join are dropped at the scan, so the big side's
    exchange carries ~selectivity× the bytes. This is the shuffle-join
    analogue of DPP (``scan_dynamic_partition_pruning`` prunes whole
    partitions; the bloom filter prunes row-by-row inside them) and the
    technique that makes selective fact⋈dim shuffle joins survivable at
    100 TB when the dim is too large to broadcast.

    Spark's injection thresholds assume cluster-scale inputs (the
    application side must scan ≥10 GB by default, and a broadcastable
    dim short-circuits the rule — join hints do too, so the broadcast
    threshold conf is the only way to reproduce the big-cluster shuffle
    shape locally). The builder therefore loosens the thresholds,
    forces physical planning (QueryExecution memoizes the executed
    plan), and restores every session conf — no conf state leaks to
    later queries, and this DataFrame keeps its bloom-filtered plan.
    tests/test_plans.py asserts ``bloom_filter_agg`` in this plan; the
    hash check proves pruning changed no answer.
    """
    conf = spark.conf
    touched = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in touched.items():
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
        conf.set(k, v)
    try:
        dim = (
            t["orders"]
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        fact = t["lineitem"].select(
            "l_orderkey",
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        out = (
            fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum("cents").alias("cents"),
            )
        )
        # force planning NOW, while the loosened thresholds are active;
        # the memoized executedPlan is what every later action runs
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


_BFS_HOPS = 6


def _bfs_oracle() -> str:
    """Recursive-CTE BFS capped at the same fixed hop budget."""
    return f"""
WITH RECURSIVE ob AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
e AS (
  SELECT a.brand AS src, b.brand AS dst
  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
root AS (SELECT min(src) AS node FROM sym),
bfs AS (
  SELECT node, 0 AS dist FROM root
  UNION ALL
  SELECT s.dst, b.dist + 1
  FROM bfs b JOIN sym s ON b.node = s.src
  WHERE b.dist < {_BFS_HOPS}
)
SELECT node AS brand, CAST(MIN(dist) AS BIGINT) AS dist
FROM bfs GROUP BY node
"""


@register("graph_bfs_shortest_path", oracle=_bfs_oracle(), tier="P3")
def graph_bfs_shortest_path(spark, t):
    """Unweighted single-source shortest paths (BFS) over the brand
    co-occurrence graph (same edge build as ``graph_pagerank``: brand
    pairs sharing ≥5 orders, symmetrized), rooted at the smallest brand
    node, hop budget fixed at 6.

    This is the frontier-expansion representative of the graph family:
    ``graph_pagerank`` iterates a DENSE state (every node, every
    round); BFS iterates a SPARSE one — each round joins only the
    still-unvisited frontier against the edge list and anti-joins the
    visited set, so per-round work tracks the frontier size, the way
    Pregel/GraphX BFS behaves. The hop budget is a FIXED constant
    (determinism policy: never a data-dependent convergence test), and
    the oracle's recursive CTE carries the same cap, so both engines
    agree even if the graph's diameter exceeds it.

    Scale: each hop is one shuffle join keyed on src (pre-partition the
    symmetrized edges once and every hop reuses the layout) plus one
    anti-join against the visited frame, which grows to |reachable
    nodes| — both bounded by the graph, never by the fact table that
    derived it. The per-hop frontier is cached; a 100 TB deployment
    checkpoints the visited frame every ~20 hops to bound lineage, as
    ``dedup_connected_components`` does.
    """
    ob = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
    )
    e = (
        ob.groupBy("okey")
        .agg(F.sort_array(F.collect_set("brand")).alias("brands"))
        .select(F.posexplode("brands").alias("pos", "src"), "brands")
        .select(
            "src",
            F.explode(F.slice("brands", F.col("pos") + 2, 64)).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 5)
        .select("src", "dst")
    )
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    root = sym.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).alias("dist")
    )
    # Cache discipline: long-lived sessions (the driver's ~350-query
    # sweep shares one SparkSession) must not accumulate per-hop caches
    # — the same leak class that produced the documented 17× bench
    # noise. Every intermediate is tracked and unpersisted once the
    # final frame is materialized via an eager localCheckpoint (which
    # cuts lineage, so dropping the parents cannot force a recompute).
    cached = [sym]
    visited = root.cache()
    cached.append(visited)
    frontier = root
    for hop in range(1, _BFS_HOPS + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["src"])
            .select(F.col("dst").alias("node"), F.lit(hop).alias("dist"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        ).cache()
        cached.append(nxt)
        if nxt.isEmpty():  # frontier exhausted before the hop budget
            break
        visited = visited.unionByName(nxt).cache()
        cached.append(visited)
        frontier = nxt
    result = visited.select(
        F.col("node").alias("brand"), "dist"
    ).localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return result


def _lpa_edges_labels(t):
    """Shared dataflow for the LPA family: the sparsified co-purchase
    edge list (both directions, l_quantity <= 8 — see
    graph_label_propagation's docstring for why) and the labels after
    3 synchronous majority rounds. Extracted so
    graph_modularity_communities audits EXACTLY the communities
    graph_label_propagation reports."""
    base = t["lineitem"].filter(F.col("l_quantity") <= 8).select(
        "l_orderkey", "l_partkey"
    )
    edges = (
        base.alias("x")
        .join(base.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") != F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    # Intermediate rounds stay LAZY: each round's labels have exactly
    # one consumer (the next round's join), so the lineage is linear —
    # three joins/aggs/windows compile as one plan with no per-round
    # driver-blocking materialization job (r9 A/B: 2.15 → 1.77 s
    # median; contrast graph_kcore_peel, where each round's edges feed
    # THREE next-round consumers and the per-round cut is load-bearing).
    # Only the FINAL labels checkpoint, because graph_modularity's
    # audit reads them three times (kc + both wc sides).
    for i in range(3):
        labels = (
            edges.join(
                labels.withColumnRenamed("node", "b"), "b"
            )
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
        if i == 2:
            labels = labels.localCheckpoint()
    return edges, labels



@register(
    "graph_label_propagation",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity <= 8
    ),
    e0 AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM base l1 JOIN base l2 ON l1.l_orderkey = l2.l_orderkey
      WHERE l1.l_partkey <> l2.l_partkey
    ),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM e0),
    c1 AS (
      SELECT e.a AS node, l.label, COUNT(*) AS c
      FROM e0 e JOIN l0 l ON e.b = l.node GROUP BY 1, 2
    ),
    l1 AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM c1) WHERE rn = 1
    ),
    c2 AS (
      SELECT e.a AS node, l.label, COUNT(*) AS c
      FROM e0 e JOIN l1 l ON e.b = l.node GROUP BY 1, 2
    ),
    l2 AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM c2) WHERE rn = 1
    ),
    c3 AS (
      SELECT e.a AS node, l.label, COUNT(*) AS c
      FROM e0 e JOIN l2 l ON e.b = l.node GROUP BY 1, 2
    ),
    l3 AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM c3) WHERE rn = 1
    )
    SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(node) AS BIGINT) AS min_node,
           CAST(MAX(node) AS BIGINT) AS max_node
    FROM l3 GROUP BY label HAVING COUNT(*) >= 2
    """,
    tier="P3",
)
def graph_label_propagation(spark, t):
    """Community detection by SYNCHRONOUS majority label propagation
    (Raghavan et al. 2007) over the sparsified co-purchase graph — the
    near-linear-time community extractor, here in its deterministic
    synchronous form: every node starts labeled with its own id, and
    each of 3 unrolled rounds relabels EVERY node simultaneously with
    the most frequent label among its neighbors, ties broken toward
    the SMALLEST label (classic async LPA visits nodes in random order
    and never hash-checks; the synchronous + total-order variant is a
    pure function of the graph, so DuckDB replays it exactly).

    Same sparsified edge set as ``graph_kcore_peel`` (l_quantity ≤ 8 —
    the full co-purchase graph is near-complete and would collapse to
    one community in a single round); the edge list carries both
    directions, so one groupBy per round sees every neighborhood.
    Output: communities with ≥ 2 members after round 3.

    Spark shape mirrors ``graph_kcore_peel``: 3 fixed unrolled rounds
    (no driver convergence loop — one Catalyst plan), each round =
    edge⋈labels equi-join, (node, label) count, and a row_number
    argmax window; ``localCheckpoint`` cuts lineage because each
    round's labels feed the next round's join. Label frames shrink to
    |V| rows immediately, so AQE broadcasts the label side of every
    round's join; the only data-proportional shuffle is the first
    neighbor count. At 100 TB, synchronous LPA is exactly the
    Pregel-style iteration GraphX/GraphFrames run — fixed rounds keep
    the plan bounded and power-law graphs converge in a handful of
    sweeps.
    """
    edges, labels = _lpa_edges_labels(t)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .filter(F.col("n_nodes") >= 2)
    )



@register(
    "join_range_bucketed",
    oracle="""
    WITH anchor AS (
      SELECT date_trunc('day', MIN(ts)) AS t0 FROM events
    ),
    win AS (
      SELECT i.i AS w_id,
             a.t0 + i.i * INTERVAL 12 HOUR AS w_start,
             a.t0 + i.i * INTERVAL 12 HOUR + INTERVAL 6 HOUR AS w_end
      FROM range(60) i(i) CROSS JOIN anchor a
    ),
    ev AS (
      SELECT ts, user_id, value, CAST(ts AS DATE) AS bucket FROM events
    )
    SELECT w.w_id, w.w_start,
           CAST(COUNT(e.ts) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(COALESCE(SUM(CAST(floor(e.value * 100) AS BIGINT)), 0)
                AS BIGINT) AS value_cents
    FROM win w
    LEFT JOIN ev e
      ON e.bucket = CAST(w.w_start AS DATE)
     AND e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.w_id, w.w_start
    ORDER BY w.w_id
""",
    tier="P1",
)
def join_range_bucketed(spark, t):
    """BUCKETED range join — the scalable form of "which rows fall in
    which time window": 60 derived six-hour windows (every 12 h from
    the stream's first day — campaign/maintenance windows in
    production) joined to the event stream. A naive interval join is a
    theta join (every row tested against every window — a nested-loop
    Cartesian at 100 TB); the bucketed form maps BOTH sides to a
    coarse equi key first (the calendar day: each 6 h window lies
    inside one day) and keeps only the residual range predicate as a
    post-join filter — Spark plans a hash join on the bucket, so work
    is collision-local and data-proportional. This is the classic
    range-join optimization (Databricks' range-join "bin" hint,
    DuckDB's IEJoin literature) expressed with vanilla operators.
    Windows spanning bucket boundaries explode to one row per touched
    bucket (here exactly 1; the general pattern applies sequence() on
    the interval, cf. the day-bucket explode in `join_interval_overlap`
    — that op broadcasts real intervals; this one showcases the
    equi-bucket reduction itself, left-joined so empty windows report
    zero).

    Exactness: window bounds are integer-hour arithmetic from ONE
    anchored MIN; event values fold as per-row FLOOR(value·100) cents
    (integer micro-unit sums); counts are integers.
    """
    anchor = t["events"].agg(
        F.date_trunc("day", F.min("ts")).alias("t0")
    )
    win = (
        spark.range(60)
        .select(F.col("id").cast("int").alias("w_id"))
        .crossJoin(F.broadcast(anchor))
        .select(
            "w_id",
            (
                F.col("t0")
                + F.make_dt_interval(hours=F.col("w_id") * 12)
            ).alias("w_start"),
            (
                F.col("t0")
                + F.make_dt_interval(hours=F.col("w_id") * 12 + 6)
            ).alias("w_end"),
        )
    )
    ev = t["events"].select(
        "ts", "user_id", "value", F.to_date("ts").alias("bucket")
    )
    joined = F.broadcast(win).join(
        ev,
        (F.col("bucket") == F.to_date("w_start"))
        & (F.col("ts") >= F.col("w_start"))
        & (F.col("ts") < F.col("w_end")),
        "left",
    )
    return (
        joined.groupBy("w_id", "w_start")
        .agg(
            F.count("ts").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.coalesce(
                F.sum(F.floor(F.col("value") * 100).cast("bigint")),
                F.lit(0),
            ).cast("bigint").alias("value_cents"),
        )
        .orderBy("w_id")
    )


@register(
    "graph_modularity_communities",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity <= 8
    ),
    e0 AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM base l1 JOIN base l2 ON l1.l_orderkey = l2.l_orderkey
      WHERE l1.l_partkey <> l2.l_partkey
    ),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM e0),
    c1 AS (
      SELECT e.a AS node, l.label, COUNT(*) AS c
      FROM e0 e JOIN l0 l ON e.b = l.node GROUP BY 1, 2
    ),
    l1 AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM c1) WHERE rn = 1
    ),
    c2 AS (
      SELECT e.a AS node, l.label, COUNT(*) AS c
      FROM e0 e JOIN l1 l ON e.b = l.node GROUP BY 1, 2
    ),
    l2 AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM c2) WHERE rn = 1
    ),
    c3 AS (
      SELECT e.a AS node, l.label, COUNT(*) AS c
      FROM e0 e JOIN l2 l ON e.b = l.node GROUP BY 1, 2
    ),
    l3 AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM c3) WHERE rn = 1
    ),
    deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM e0 GROUP BY a),
    m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM e0),
    kc AS (SELECT l.label AS community,
                  CAST(COUNT(*) AS BIGINT) AS n_nodes,
                  CAST(SUM(d.deg) AS BIGINT) AS degree_sum
           FROM l3 l JOIN deg d ON d.node = l.node GROUP BY 1),
    wc AS (SELECT la.label AS community, CAST(COUNT(*) AS BIGINT) AS e_c
           FROM e0 e
           JOIN l3 la ON la.node = e.a
           JOIN l3 lb ON lb.node = e.b
           WHERE la.label = lb.label GROUP BY 1)
    SELECT kc.community, kc.n_nodes,
           CAST(COALESCE(wc.e_c, 0) AS BIGINT) AS within_edges,
           kc.degree_sum,
           round((COALESCE(wc.e_c, 0) * m2.m2
                  - kc.degree_sum * kc.degree_sum) * 1.0
                 / (m2.m2 * m2.m2), 6) AS q_contrib
    FROM kc CROSS JOIN m2
    LEFT JOIN wc ON wc.community = kc.community
    ORDER BY kc.community
    """,
    tier="P3",
)
def graph_modularity_communities(spark, t):
    """Newman MODULARITY audit of the label-propagation communities —
    the quality gate after any community detector: per community c,
    Q_c = e_c/(2m) - (K_c/(2m))^2 (within-edge mass minus the degree-
    preserving null model's expectation); sum over communities = the
    global modularity Q that decides whether the LPA partition is
    structure or noise. Runs the IDENTICAL 3-round synchronous LPA as
    ``graph_label_propagation`` (shared ``_lpa_edges_labels`` dataflow)
    so the audit scores exactly the communities that operator reports.

    Exactness: e_c (directed within-edges), K_c (degree sums) and 2m
    (directed edge count) are exact BIGINTs; the contribution is ONE
    fixed-tree division (e_c*2m - K_c^2)/(2m)^2 of exact ints, rounded
    for display. Scale shape: degrees and within-edge counts are keyed
    aggregates over the edge list; the label frame joins are |V|-sized
    and AQE-broadcast; the 1-row 2m frame is a broadcast crossJoin.
    """
    edges, labels = _lpa_edges_labels(t)
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    m2 = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m2"))
    kc = (
        labels.join(deg, "node")
        .groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("deg").cast("bigint").alias("degree_sum"),
        )
    )
    wc = (
        edges.join(
            labels.select(
                F.col("node").alias("a"), F.col("label").alias("lab_a")
            ),
            "a",
        )
        .join(
            labels.select(
                F.col("node").alias("b"), F.col("label").alias("lab_b")
            ),
            "b",
        )
        .filter(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    within = F.coalesce(F.col("e_c"), F.lit(0)).cast("bigint")
    return (
        kc.crossJoin(F.broadcast(m2))
        .join(wc, "community", "left")
        .select(
            "community",
            "n_nodes",
            within.alias("within_edges"),
            "degree_sum",
            F.round(
                (within * F.col("m2")
                 - F.col("degree_sum") * F.col("degree_sum"))
                * 1.0
                / (F.col("m2") * F.col("m2")),
                6,
            ).alias("q_contrib"),
        )
        .orderBy("community")
    )


@register(
    "graph_degree_assortativity",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity <= 8
    ),
    e0 AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM base l1 JOIN base l2 ON l1.l_orderkey = l2.l_orderkey
      WHERE l1.l_partkey <> l2.l_partkey
    ),
    deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM e0 GROUP BY a),
    ej AS (
      SELECT da.deg AS ja, db.deg AS jb
      FROM e0 e
      JOIN deg da ON da.node = e.a
      JOIN deg db ON db.node = e.b
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS m,
             CAST(SUM(ja) AS DOUBLE) AS sa,
             CAST(SUM(jb) AS DOUBLE) AS sb,
             CAST(SUM(ja * jb) AS DOUBLE) AS sab,
             CAST(SUM(ja * ja) AS DOUBLE) AS saa,
             CAST(SUM(jb * jb) AS DOUBLE) AS sbb
      FROM ej
    )
    SELECT CAST(m AS BIGINT) AS m2_edges,
           round(sa / m, 4) AS mean_deg_src,
           round((sab / m - (sa / m) * (sb / m))
                 / sqrt((saa / m - (sa / m) * (sa / m))
                        * (sbb / m - (sb / m) * (sb / m))), 6)
             AS assortativity
    FROM mom
    """,
    tier="P3",
)
def graph_degree_assortativity(spark, t):
    """DEGREE ASSORTATIVITY of the co-purchase graph — Newman's
    "do hubs link to hubs?" coefficient: the Pearson correlation of
    endpoint degrees over the (both-directions) edge list. Positive r
    = assortative (social-network-like), negative = disassortative
    (hub-and-spoke, typical for purchase graphs) — the one-number
    structure summary that decides whether degree-targeted sampling or
    hub-salting is needed before heavier graph ops. Completes the
    structural toolkit beside ``graph_degree_distribution`` (marginal)
    and ``graph_modularity_communities`` (partition quality).

    Exactness: degrees and all five co-moments are exact BIGINT sums
    (one edge-list pass after two broadcast degree attaches); r is one
    fixed double tree with an IEEE-exact sqrt. Scale shape: degree =
    keyed count; the moment fold is map-side-combined; nothing grows
    beyond the edge list. Same sparsified graph as the LPA family
    (l_quantity <= 8), so the numbers describe the graph those
    operators actually run on.
    """
    base = t["lineitem"].filter(F.col("l_quantity") <= 8).select(
        "l_orderkey", "l_partkey"
    )
    edges = (
        base.alias("x")
        .join(base.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") != F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .distinct()
    )
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    ej = (
        edges.join(
            deg.select(F.col("node").alias("a"), F.col("deg").alias("ja")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("jb")),
            "b",
        )
        .select("ja", "jb")
    )
    mom = ej.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("ja").cast("double").alias("sa"),
        F.sum("jb").cast("double").alias("sb"),
        F.sum(F.col("ja") * F.col("jb")).cast("double").alias("sab"),
        F.sum(F.col("ja") * F.col("ja")).cast("double").alias("saa"),
        F.sum(F.col("jb") * F.col("jb")).cast("double").alias("sbb"),
    )
    m, sa, sb = F.col("m"), F.col("sa"), F.col("sb")
    num = F.col("sab") / m - (sa / m) * (sb / m)
    den = F.sqrt(
        (F.col("saa") / m - (sa / m) * (sa / m))
        * (F.col("sbb") / m - (sb / m) * (sb / m))
    )
    return mom.select(
        m.cast("bigint").alias("m2_edges"),
        F.round(sa / m, 4).alias("mean_deg_src"),
        F.round(num / den, 6).alias("assortativity"),
    )
