"""Deterministic sampling / dataset-split operators.

A 100 TB training-data pipeline needs samples that are (a) reproducible
across runs and engines — no RNG state, no partition-order dependence —
and (b) computable without materializing or shuffling the full table.
Every operator here keys its randomness on the portable 60-bit md5 hash
(``functions/portable_hash.py``), so the "coin flip" for a row is a pure
column expression: map-side, codegen-friendly, and bit-identical in the
DuckDB oracle.

Scale posture:

- ``sample_hash_bernoulli`` / ``sample_split_assign`` are pure
  projections + filters — zero shuffles, and the parquet scan still
  prunes columns. At 100 TB they cost one pass over the pruned columns.
- ``sample_topk_per_stratum`` bounds per-group output (k rows) with a
  probabilistic hash-threshold pre-filter BEFORE the exact rank, so the
  window never sees more than ~margin·k rows per stratum — the two-phase
  answer to "row_number over 5 strata funnels the whole table into 5
  tasks".
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.helpers import r4
from ..functions.portable_hash import ph60, ph60_sql
from ..registry import register

#: 2^60 — the exclusive upper bound of ph60's range; fractions of this
#: are the sampling thresholds.
PH60_RANGE = 1 << 60


@register(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT event_id, user_id, event_type, round(value, 4) AS value
    FROM events
    WHERE {ph60_sql("event_id", "bern")} % 100 < 10
    """,
    tier="P2",
)
def sample_hash_bernoulli(spark, t):
    """Deterministic 10 % Bernoulli sample of events, keyed on
    ``ph60(event_id)`` — the reproducible replacement for
    ``df.sample()`` (whose output depends on seed + partition layout,
    so it can never hash-match an oracle or a rerun).

    The predicate is a pure column expression: Catalyst keeps it next
    to the scan, no shuffle, no RNG state. Re-running on a superset of
    the data keeps every previously-sampled row (hash-stable sampling
    is append-consistent) — the property that makes incremental
    training-set refreshes possible at 100 TB.
    """
    e = t["events"]
    return e.filter(ph60("event_id", "bern") % 100 < 10).select(
        "event_id", "user_id", "event_type", r4("value").alias("value")
    )


@register(
    "sample_split_assign",
    oracle=f"""
    WITH folds AS (
      SELECT event_type,
             CASE WHEN f < 80 THEN 'train'
                  WHEN f < 90 THEN 'valid'
                  ELSE 'test' END AS split,
             value
      FROM (SELECT event_type, value,
                   {ph60_sql("event_id", "fold")} % 100 AS f
            FROM events)
    )
    SELECT event_type, split, count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM folds GROUP BY event_type, split
    """,
    tier="P2",
)
def sample_split_assign(spark, t):
    """Deterministic 80/10/10 train/valid/test assignment with a
    per-stratum accounting report (count + value mass per
    event_type × split).

    The fold is ``ph60(event_id) % 100`` — any worker (or any engine)
    recomputes the same split for any row with no coordination, which
    is how a 1000-executor job splits 100 TB without a shuffle or a
    persisted assignment table. The report aggregation is the only
    shuffle, and its cardinality is |event_type| × 3.
    """
    f = ph60("event_id", "fold") % 100
    split = (
        F.when(f < 80, "train").when(f < 90, "valid").otherwise("test")
    )
    return (
        t["events"]
        .select("event_type", "value", split.alias("split"))
        .groupBy("event_type", "split")
        .agg(F.count("*").alias("n"), r4(F.sum("value")).alias("sum_value"))
    )


#: top-k sample size per stratum, and the pre-filter safety margin.
#: The pre-filter keeps rows with hash < margin·k/n_stratum of the hash
#: range; the k-th order statistic of n uniform hashes concentrates at
#: k/n · 2^60, so margin=8 bounds the miss probability by
#: P[Binomial(n, 8k/n) < k] < e^{-8k·(7/8)²/2} ≈ 1e-60 at k=50 — far
#: below any practical determinism bar, and the exact rank afterwards
#: makes the output identical to the unfiltered answer whenever the
#: pre-filter keeps ≥ k rows (tests/test_units.py asserts it).
SAMPLE_K = 50
SAMPLE_MARGIN = 8


@register(
    "sample_topk_per_stratum",
    oracle=f"""
    SELECT event_id, event_type, rk FROM (
      SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY {ph60_sql("event_id", "res")},
                                         event_id) AS rk
      FROM events
    ) WHERE rk <= {SAMPLE_K}
    """,
    tier="P2",
)
def sample_topk_per_stratum(spark, t):
    """Exactly-k-per-stratum uniform sample: the k events with the
    smallest ``ph60(event_id)`` per event_type — the deterministic,
    mergeable equivalent of per-group reservoir sampling (priority
    sampling with hash priorities).

    Naive plan: ``row_number() OVER (PARTITION BY event_type ORDER BY
    hash)`` shuffles EVERY row into |event_type| tasks — 5 tasks doing
    all the work at 100 TB. Instead, a first cheap aggregate counts each
    stratum, a hash threshold of ``margin·k/n`` of the hash range is
    broadcast back, and the exact rank runs over the ~margin·k surviving
    rows per stratum (see SAMPLE_MARGIN for the miss-probability bound).
    The shuffle input drops from n rows to ~margin·k·|strata| rows.
    """
    e = t["events"].select("event_id", "event_type")
    h = ph60("event_id", "res")
    counts = e.groupBy("event_type").agg(F.count("*").alias("n_stratum"))
    # threshold as double to avoid bigint overflow of margin·k·2^60/n
    thresh = (
        F.lit(float(PH60_RANGE))
        * F.lit(SAMPLE_MARGIN * SAMPLE_K)
        / F.col("n_stratum")
    )
    survivors = (
        e.withColumn("h", h)
        .join(F.broadcast(counts), "event_type")
        .filter(F.col("h").cast("double") < thresh)
    )
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    return (
        survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("event_id", "event_type", "rk")
    )


@register(
    "sample_systematic_every_nth",
    oracle="""
    WITH ranked AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             row_number() OVER (ORDER BY c_custkey) AS rn
      FROM customer
    )
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 4) AS c_acctbal
    FROM ranked
    WHERE rn % 10 = 1
    ORDER BY c_custkey
    """,
    tier="P2",
)
def sample_systematic_every_nth(spark, t):
    """Systematic (every-nth) sampling: rank the frame by a total order
    and keep each 10th row — the auditor's sampling design (equal-
    probability, evenly spread over the key range, trivially
    reproducible), completing the sampling family next to hash-
    Bernoulli (random-like), stratified top-k, and split assignment.

    The oracle's partition-less ``row_number`` is exactly what this op
    must NOT do at scale: the rank comes from
    ``two_phase_global_rank`` (range partition → local rank → 16-row
    offsets frame), so the plan holds at any row count and the modulo
    filter is a map-side projection on the ranked stream.
    """
    from .windows import two_phase_global_rank

    ranked = two_phase_global_rank(
        t["customer"].select("c_custkey", "c_mktsegment", "c_acctbal"),
        [F.asc("c_custkey")],
    )
    return (
        ranked.filter((F.col("rn") % 10) == 1)
        .select(
            "c_custkey", "c_mktsegment", F.round("c_acctbal", 4).alias("c_acctbal")
        )
        .orderBy("c_custkey")
    )


@register(
    "sample_weighted_priority",
    oracle=f"""
    WITH w AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice) AS BIGINT) AS weight,
             ({ph60_sql("CAST(o_orderkey AS VARCHAR)", "wres")} + 1)
               / 1152921504606846976.0 AS u
      FROM orders
    ),
    k AS (SELECT o_orderpriority, o_orderkey, weight,
                 -ln(u) / weight AS ekey
          FROM w),
    r AS (SELECT o_orderpriority, o_orderkey, weight,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY ekey, o_orderkey) AS rk
          FROM k)
    SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey, weight
    FROM r WHERE rk <= 8
    ORDER BY o_orderpriority, rk
    """,
    tier="P2",
)
def sample_weighted_priority(spark, t):
    """WEIGHTED reservoir sampling (Efraimidis-Spirakis A-ES), exactly-k
    per stratum — the weighted sibling of ``sample_topk_per_stratum``:
    each order draws the exponential race key -ln(u)/w (u a portable
    hash uniform in (0,1], w = floored order total), and the 8 smallest
    keys per priority class win. Equivalent to sequential weighted
    reservoir sampling but fully order-free: the key is a pure column
    expression, so the sample is reproducible across runs, engines,
    partitionings, and appends (new rows only displace losers).

    Cross-engine determinism: u = (ph60+1)/2^60 is a dyadic-rational
    double (exact), ln() and the divide are single IEEE ops both
    engines round identically, and the (ekey, o_orderkey) sort key
    breaks any residual tie exactly. Scale shape: one window partitioned
    by the 5-value stratum; at 100 TB you bolt on the same broadcast
    hash-threshold pre-filter as ``sample_topk_per_stratum`` (keep rows
    with ekey below a per-stratum quantile bound) so the rank input
    stays ~margin*k rows per stratum — the key function is unchanged,
    only the candidate set shrinks.
    """
    u = (ph60("o_orderkey", "wres") + 1) / F.lit(
        float(1 << 60)
    )
    k = t["orders"].select(
        "o_orderpriority",
        "o_orderkey",
        F.floor("o_totalprice").cast("bigint").alias("weight"),
        (-F.log(u) / F.floor("o_totalprice").cast("bigint")).alias("ekey"),
    )
    win = Window.partitionBy("o_orderpriority").orderBy("ekey", "o_orderkey")
    return (
        k.withColumn("rk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rk") <= 8)
        .select("o_orderpriority", "rk", "o_orderkey", "weight")
        .orderBy("o_orderpriority", "rk")
    )


@register(
    "sample_stratified_proportional",
    oracle=f"""
    WITH pop AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_pop
      FROM orders GROUP BY o_orderpriority
    ),
    tot AS (SELECT CAST(SUM(n_pop) AS BIGINT) AS n FROM pop),
    alloc AS (
      SELECT p.o_orderpriority, p.n_pop,
             CAST(floor(1000.0 * p.n_pop / t.n) AS BIGINT) AS alloc
      FROM pop p CROSS JOIN tot t
    ),
    ranked AS (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY {ph60_sql("CAST(o_orderkey AS VARCHAR)", "strat")},
                        o_orderkey) AS rk
      FROM orders
    ),
    samp AS (
      SELECT r.o_orderpriority, r.o_orderkey
      FROM ranked r JOIN alloc a
        ON a.o_orderpriority = r.o_orderpriority AND r.rk <= a.alloc
    )
    SELECT a.o_orderpriority, a.n_pop, a.alloc,
           CAST(COUNT(s.o_orderkey) AS BIGINT) AS n_sampled,
           CAST(SUM(s.o_orderkey) AS BIGINT) AS key_checksum,
           CAST(MIN(s.o_orderkey) AS BIGINT) AS min_key
    FROM alloc a LEFT JOIN samp s
      ON s.o_orderpriority = a.o_orderpriority
    GROUP BY a.o_orderpriority, a.n_pop, a.alloc
    ORDER BY a.o_orderpriority
    """,
    tier="P2",
)
def sample_stratified_proportional(spark, t):
    """PROPORTIONAL-ALLOCATION stratified sampling — the survey-
    sampling workhorse between ``sample_hash_bernoulli`` (no allocation
    control) and ``sample_topk_per_stratum`` (equal k per stratum): a
    1000-row budget is split across priority strata in proportion to
    their population (alloc_s = floor(1000 * n_s / N)), and each
    stratum fills its allocation with its hash-smallest keys — so the
    sample is reproducible, append-consistent (a new row only enters by
    displacing the hash-largest member), and exactly proportionally
    representative. The report is the per-stratum audit (population,
    allocation, filled count, key checksum) rather than the sampled
    rows, making the hash check a proof of the exact member set.

    Scale shape: stratum counts are one map-side-combined fold; the
    rank window partitions by the 5-value stratum (at 100 TB, the same
    broadcast hash-threshold pre-filter as ``sample_topk_per_stratum``
    bounds the rank input — allocations are known before the window
    runs). All arithmetic is exact: floor(1000 * n_s / N) divides
    exact ints identically on both engines.
    """
    pop = t["orders"].groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop")
    )
    tot = pop.agg(F.sum("n_pop").cast("bigint").alias("n"))
    alloc = pop.crossJoin(F.broadcast(tot)).select(
        "o_orderpriority",
        "n_pop",
        F.floor(1000.0 * F.col("n_pop") / F.col("n"))
        .cast("bigint")
        .alias("alloc"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        ph60("o_orderkey", "strat"), "o_orderkey"
    )
    ranked = t["orders"].select(
        "o_orderpriority",
        "o_orderkey",
        F.row_number().over(w).alias("rk"),
    )
    samp = ranked.join(
        F.broadcast(alloc.select("o_orderpriority", "alloc")),
        "o_orderpriority",
    ).filter(F.col("rk") <= F.col("alloc"))
    return (
        alloc.join(
            samp.groupBy("o_orderpriority").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
                F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
            ),
            "o_orderpriority",
            "left",
        )
        .select(
            "o_orderpriority",
            "n_pop",
            "alloc",
            F.coalesce(F.col("n_sampled"), F.lit(0))
            .cast("bigint")
            .alias("n_sampled"),
            "key_checksum",
            "min_key",
        )
        .orderBy("o_orderpriority")
    )
