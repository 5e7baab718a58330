"""UDF / UDAF / UDTF surface (SURVEY.md §2-K).

Each query's logic is also expressible in pure SQL, so the oracle checks
the *plumbing* (Py4J row UDFs, Arrow pandas UDFs, grouped-map, lateral
UDTF) produces SQL-identical results. The row UDF exists to prove the
surface — the pandas variants are the only ones allowed in hot paths
(SURVEY.md §3.2: Arrow batches vs per-row pickling).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..functions.helpers import r4
from ..registry import register

_BAND_SQL_CASE = """
CASE WHEN o_totalprice < 50000 THEN 'small'
     WHEN o_totalprice < 200000 THEN 'medium'
     WHEN o_totalprice < 350000 THEN 'large'
     ELSE 'jumbo' END
"""


def _band(price: float) -> str:
    if price < 50000:
        return "small"
    if price < 200000:
        return "medium"
    if price < 350000:
        return "large"
    return "jumbo"


@register(
    "udf_python_scalar",
    oracle=f"""
    SELECT o_orderkey, {_BAND_SQL_CASE} AS price_band FROM orders
    """,
    tier="P1",
)
def udf_python_scalar(spark, t):
    """Row-at-a-time Python UDF (the slow path, here only to prove the
    surface; tests pin the pandas variant as the hot-path choice)."""
    band_udf = F.udf(_band, "string")
    return t["orders"].select(
        "o_orderkey", band_udf("o_totalprice").alias("price_band")
    )


@register(
    "udf_pandas_scalar",
    oracle=f"""
    SELECT o_orderkey, {_BAND_SQL_CASE} AS price_band FROM orders
    """,
    tier="P1",
)
def udf_pandas_scalar(spark, t):
    """Same logic as udf_python_scalar through an Arrow-vectorized pandas
    UDF — identical results, ~10-100× less Python overhead."""

    @F.pandas_udf("string")
    def band(prices: pd.Series) -> pd.Series:
        return pd.cut(
            prices,
            bins=[-float("inf"), 50000, 200000, 350000, float("inf")],
            labels=["small", "medium", "large", "jumbo"],
            right=False,
        ).astype(str)

    return t["orders"].select("o_orderkey", band("o_totalprice").alias("price_band"))


@register(
    "udaf_pandas_grouped_agg",
    oracle="""
    SELECT p_brand,
           round(SUM(p_retailprice * p_size) / SUM(p_size), 4) AS weighted_avg_price
    FROM part GROUP BY p_brand
    """,
    tier="P2",
)
def udaf_pandas_grouped_agg(spark, t):
    """Grouped-aggregate pandas UDF: size-weighted mean retail price per
    brand (Arrow batches per group, partial aggregation handled by Spark)."""

    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, size: pd.Series) -> float:
        return float((price * size).sum() / size.sum())

    return (
        t["part"]
        .groupBy("p_brand")
        .agg(r4(weighted_avg("p_retailprice", "p_size")).alias("weighted_avg_price"))
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT c_custkey,
           round((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4)
             AS zscore
    FROM customer
    """,
    tier="P2",
)
def udf_grouped_map(spark, t):
    """Grouped-map applyInPandas: per-segment z-score normalization.
    pandas std(ddof=1) ≡ SQL stddev_samp, so the oracle is a window query."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        z = (bal - bal.mean()) / bal.std(ddof=1)
        return pd.DataFrame({"c_custkey": pdf["c_custkey"], "zscore": z})

    normalized = (
        t["customer"]
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(zscore, "c_custkey long, zscore double")
    )
    # round JVM-side: numpy rounds half-to-even, Spark/DuckDB half-up (§5.4)
    return normalized.select("c_custkey", r4("zscore").alias("zscore"))


@register(
    "udtf_python",
    oracle="""
    SELECT o.o_orderkey,
           CAST(generate_subscripts(string_split(o.o_orderpriority, '-'), 1)
                AS INTEGER) AS pos,
           unnest(string_split(o.o_orderpriority, '-')) AS word
    FROM orders o
    """,
    tier="P3",
)
def udtf_python(spark, t):
    """Python UDTF (Spark 4): one row in → n rows out, splitting
    o_orderpriority into (pos, word) rows via a LATERAL call."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, word: string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split("-"), start=1):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    return spark.sql(
        """
        SELECT o.o_orderkey, s.pos, s.word
        FROM orders o, LATERAL split_words(o.o_orderpriority) s
        """
    )


@register(
    "udf_pandas_iter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 1.1 * 10000 + 0.5)
             / 10000 AS taxed_net
    FROM lineitem
    """,
    tier="P2",
)
def udf_pandas_iter(spark, t):
    """Iterator-of-series pandas UDF (SCALAR_ITER): the variant for UDFs
    with expensive per-executor setup (model load, dictionary mmap) —
    the init cost is paid once per partition, then every Arrow batch
    streams through the same state. Here the "state" is a constant tax
    rate, so the result is oracle-checkable; the shape is what matters.

    Rounds via floor(x*1e4 + 0.5)/1e4, not round(): the *1.1 product
    lands on .xxxx5 midpoints where the engines' round() disagree
    (caught by the driver-sim hash check; same fix as
    ``ts_interpolate_linear``).
    """
    @F.pandas_udf("double")
    def taxed_net(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rate = 1.1  # expensive-setup stand-in: loaded once per partition
        for net in batches:
            yield net * rate

    net = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(taxed_net(net) * 10000 + F.lit(0.5)).cast("bigint")
            / F.lit(10000.0)
        ).alias("taxed_net"),
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT o_orderkey,
           floor(o_totalprice * 0.2 * 10000 + 0.5) / 10000 AS fee
    FROM orders
    """,
    tier="P2",
)
def udf_map_in_arrow(spark, t):
    """mapInArrow: the zero-copy UDx surface — batches arrive as raw
    PyArrow RecordBatches (no pandas conversion at all), the right tool
    when the Python side is itself Arrow-native (polars, DuckDB,
    vectorized C extensions). Computes a 20 % fee per order; rounding
    uses the midpoint-safe floor form on both engines (§5.4).
    """
    import pyarrow as pa_mod

    def add_fee(batches: Iterator["pa_mod.RecordBatch"]) -> Iterator["pa_mod.RecordBatch"]:
        import pyarrow.compute as pc

        for batch in batches:
            fee = pc.multiply(batch.column("o_totalprice"), pa_mod.scalar(0.2))
            yield pa_mod.RecordBatch.from_arrays(
                [batch.column("o_orderkey"), fee], ["o_orderkey", "fee_raw"]
            )

    out = t["orders"].select("o_orderkey", "o_totalprice").mapInArrow(
        add_fee, "o_orderkey long, fee_raw double"
    )
    return out.select(
        "o_orderkey",
        (
            F.floor(F.col("fee_raw") * 10000 + F.lit(0.5)).cast("bigint")
            / F.lit(10000.0)
        ).alias("fee"),
    )


@register(
    "udf_rolling_median",
    oracle="""
    SELECT event_id,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS roll_median
    FROM events
    """,
    tier="P2",
)
def udf_rolling_median(spark, t):
    """Rolling 5-event median of each user's event values — the window
    aggregate Spark's built-in surface CANNOT express (percentile-family
    functions are not supported as window functions), making it the
    canonical applyInPandas extension case: per-user Arrow batches, a
    pandas ``rolling(5).median()`` inside, outputs keyed back by
    event_id. DuckDB CAN run median as a windowed aggregate, which is
    what makes this UDx hash-checkable end-to-end.

    Determinism: median is order-statistic selection (plus an exact
    (a+b)/2 midpoint for even frames) — no accumulation order to drift;
    rows are sorted (ts, event_id) inside each group before rolling.
    Scale: one shuffle on user_id; per-group memory is the group's rows
    (bounded by per-user history, the same bound every per-user window
    carries); the rolling buffer itself is 5 values.
    """
    ev = t["events"].select("event_id", "user_id", "ts", "value")

    # Arrow groups are COARSE buckets of users, not single users: one
    # Python invocation then rolls every user in the bucket via pandas
    # groupby — measured 5.1 s → 0.9 s at sf0.1 (1000 tiny per-user
    # calls were ~85 % interpreter/Arrow overhead). The bucket count
    # (64) is the parallelism knob; per-user semantics are identical
    # because the rolling groupby partitions by user inside the bucket.
    def roll(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        med = (
            pdf.groupby("user_id", sort=False)["value"]
            .rolling(5, min_periods=1)
            .median()
            .reset_index(drop=True)
        )
        return pd.DataFrame(
            {"event_id": pdf["event_id"].to_numpy(),
             "roll_median": med.round(4).to_numpy()}
        )

    return ev.withColumn(
        "bucket", F.col("user_id") % 64
    ).groupBy("bucket").applyInPandas(
        roll, "event_id long, roll_median double"
    )


@register(
    "udtf_table_sessionize",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    )
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS sum_value
    FROM sessions GROUP BY user_id, sid
    """,
    tier="P3",
)
def udtf_table_sessionize(spark, t):
    """Sessionization as a POLYMORPHIC TABLE FUNCTION — Spark 4's
    ``TABLE(...) PARTITION BY ... ORDER BY`` UDTF surface: the engine
    hands the Python class one user's rows in timestamp order, the
    class carries the 30-minute-gap state machine across rows and emits
    one row per closed session from ``terminate()``. The same semantics
    as ``etl_sessionize``'s window composition, proved equal through a
    completely different execution surface — this is the extension
    point for session logic too gnarly for window algebra (bounded
    replays, per-session ML featurization).

    Scale: PARTITION BY ships each user's rows to one UDTF instance —
    the same user_id exchange a window would make — and state is O(1)
    per instance (the open session's accumulators only).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "user_id bigint, session_id bigint, session_start timestamp, "
        "n_events bigint, sum_value double"
    ))
    class Sessionize:
        def __init__(self):
            self.user = None
            self.sid = 0
            self.start = None
            self.last_us = None
            self.n = 0
            self.total = 0.0

        def _emit(self):
            return (
                self.user,
                self.sid,
                self.start,
                self.n,
                round(self.total, 4),
            )

        def eval(self, row):
            us = int(row["ts"].timestamp() * 1_000_000)
            if self.user is None:
                self.user = row["user_id"]
            if self.last_us is not None and us - self.last_us > 1_800_000_000:
                yield self._emit()
                self.sid += 1
                self.start, self.n, self.total = None, 0, 0.0
            if self.n == 0:
                self.start = row["ts"]
                if self.sid == 0:
                    self.sid = 1
            self.last_us = us
            self.n += 1
            self.total += row["value"]

        def terminate(self):
            if self.n:
                yield self._emit()

    spark.udtf.register("sessionize_tf", Sessionize)
    return spark.sql(
        """
        SELECT * FROM sessionize_tf(
          TABLE(SELECT user_id, ts, event_id, value FROM events)
          PARTITION BY user_id ORDER BY (ts, event_id)
        )
        """
    )
