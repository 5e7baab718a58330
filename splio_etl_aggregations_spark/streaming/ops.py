"""Streaming operators over `events` (SURVEY.md §2-I).

Design (SURVEY.md §1.4): every transformation is a pure
``DataFrame → DataFrame`` function usable under both ``spark.read`` and
``spark.readStream`` — the batch path is what the DuckDB oracle hashes,
and tests/test_streaming.py replays the same parquet through Structured
Streaming (file source + availableNow) and asserts the final state equals
the batch result.

Watermark notes: watermarks only *bound state*; on a bounded replay they
don't change the final aggregate (late drops are exercised separately by
``stream_late_data`` with a crafted out-of-order feed).
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.helpers import r4
from ..registry import register
from ..sources.tmpdirs import scratch_mkdtemp


# ---------------------------------------------------------------- transforms
# Pure transformations shared by batch (below) and streaming (tests).

def tumbling_hourly(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_1h_15m(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("sum_value"),
        )
        .select(F.col("win.start").alias("window_start"), "n_events", "sum_value")
    )


def session_30m(events: DataFrame, watermark: str | None = "1 hour") -> DataFrame:
    # Unlike plain windowed aggregation, the session-merge operator evicts
    # state past the watermark even in complete output mode — pass
    # watermark=None for bounded replays that must retain every session.
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def dedup_by_event_id(events: DataFrame) -> DataFrame:
    return events.withWatermark("ts", "1 hour").dropDuplicates(["event_id"]).select(
        "event_id", "user_id", "event_type"
    )


# ------------------------------------------------------------------- queries

@register(
    "stream_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, round(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tier="P0",
)
def stream_tumbling_hourly(spark, t):
    """1-h tumbling window count + value sum per event type (batch form of
    the streaming transform; replay equivalence in tests)."""
    return tumbling_hourly(t["events"])


@register(
    "stream_sliding",
    oracle="""
    WITH ks AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS v(k)),
    win AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts)
               - ks.k * INTERVAL '15 minutes' AS window_start,
             value
      FROM events CROSS JOIN ks
    )
    SELECT window_start, COUNT(*) AS n_events, round(SUM(value), 4) AS sum_value
    FROM win GROUP BY window_start
    """,
    tier="P3",
)
def stream_sliding(spark, t):
    """1-h window sliding every 15 min: each event lands in exactly 4
    epoch-aligned windows (oracle materializes the 4 covering buckets)."""
    return sliding_1h_15m(t["events"])


@register(
    "stream_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, round(SUM(value), 4) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
    tier="P3",
)
def stream_session(spark, t):
    """Session windows (30-min inactivity gap) per user.

    Spark closes a session when the next event is ≥ gap after the last
    (window span is [first, last+gap)); the oracle's gaps-and-islands SQL
    flags a new session on exactly that predicate.
    """
    return session_30m(t["events"])


@register(
    "stream_dedup_watermark",
    oracle="SELECT DISTINCT event_id, user_id, event_type FROM events",
    tier="P3",
)
def stream_dedup_watermark(spark, t):
    """Drop duplicate event_ids within the watermark (event_id is unique in
    the fixture, so batch-equivalent = DISTINCT; the streaming test feeds
    real duplicates to prove the state-store path)."""
    return dedup_by_event_id(t["events"])


@register(
    "stream_late_data",
    oracle="""
    WITH b AS (SELECT MIN(ts) + INTERVAL 1 HOUR AS cut,
                      MAX(ts) - INTERVAL 10 MINUTE AS wm FROM events)
    SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_events
    FROM events, b
    WHERE ts >= b.cut
      AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= b.wm
    GROUP BY 1
    """,
    tier="P3",
)
def stream_late_data(spark, t):
    """Tumbling aggregate where events later than the watermark are DROPPED.

    Hash-checked since round 3 (rows-only through r2): the replay's final
    state is fully deterministic SQL — the withheld first-hour rows are
    dropped because their windows finalized under the batch-0/1 watermark
    (max on-time ts − 10 min), and append mode emits exactly the windows
    whose END is ≤ that final watermark, so the oracle is "on-time rows
    (ts ≥ min+1h), grouped hourly, windows closed by max−10min". The
    boundary strictness (≤, not <) and the ≥2h10m event span both
    predicates rely on are verified by the hash match at both fixture
    scales.

    Runs a real Structured Streaming job inside the query: the events
    table is split into 3 micro-batch files with the first hour's rows
    withheld until the very last file — by then the 10-minute watermark
    has advanced past them, so finalized windows reject those rows. The
    deterministic file order (availableNow + maxFilesPerTrigger=1 +
    lexicographic names written in ascending-mtime order) makes the drop
    set reproducible.

    The feed files are written BY SPARK (filter + single-file write per
    batch), never via a driver-side toPandas: the builder scales with
    the cluster, and the only driver-side work is renaming part files.
    The drop set is invariant to how on-time rows split across the two
    leading batches (the watermark at batch_2 is max(on-time ts) − 10 min
    either way), so a shuffle-free even/odd event_id split replaces the
    old sorted halving.
    """
    events = t["events"]
    tmp = scratch_mkdtemp(prefix="late_feed_")
    feed_dir = os.path.join(tmp, "feed")
    os.makedirs(feed_dir)

    sel = events.select("event_id", "ts", "user_id", "value")
    bounds = sel.agg((F.min("ts") + F.expr("INTERVAL 1 HOUR")).alias("cut"))
    tagged = sel.crossJoin(F.broadcast(bounds))
    # batch0/1: on-time rows (even/odd event_id); batch2: the
    # now-too-late first hour. ONE partitioned write replaces the three
    # per-batch coalesce(1) writes of the r7 form (r8 optimization
    # round, guide §1.2/§6): the events table is scanned once instead
    # of three times and the build runs one Spark job instead of three
    # — same three feed files, same rows in each (the batch id is a
    # deterministic row property, not an artifact of the write). The
    # repartition on the 3-value batch key bounds each write task by
    # its micro-batch size and yields exactly one file per batch
    # directory; the partition column itself stays out of the parquet
    # files, so the streamed schema is unchanged.
    batch = F.when(F.col("ts") < F.col("cut"), F.lit(2)).otherwise(
        (F.col("event_id") % 2).cast("int")
    )
    stage = os.path.join(tmp, "stage")
    (
        tagged.withColumn("batch", batch)
        .drop("cut")
        .repartition("batch")
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(stage)
    )
    for i in range(3):
        hits = glob.glob(os.path.join(stage, f"batch={i}", "part-*.parquet"))
        dst = os.path.join(feed_dir, f"batch_{i}.parquet")
        if hits:
            (src,) = hits  # repartition("batch") → exactly one file per batch
            os.rename(src, dst)
        else:
            # An empty micro-batch writes no batch=i directory under
            # partitionBy (ADVICE r8): emit a schema-only parquet file so
            # the replay's file count and lexicographic order stay
            # deterministic instead of crashing on the unpack.
            empty_dir = os.path.join(tmp, f"empty_{i}")
            sel.limit(0).coalesce(1).write.parquet(empty_dir)
            (src,) = glob.glob(os.path.join(empty_dir, "part-*.parquet"))
            os.rename(src, dst)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )
    sink_name = f"late_data_sink_{abs(hash(tmp)) % 10**8}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    if not query.awaitTermination(120):
        query.stop()
        raise TimeoutError(
            "stream_late_data replay did not finish within 120 s — "
            "refusing to return a partially-filled memory sink"
        )
    return spark.table(sink_name)


@register(
    "stream_stateful_counter",
    oracle="""
    WITH seg AS (
      SELECT event_id, user_id, ts, event_type,
             COUNT(*) FILTER (WHERE event_type = 'error')
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS err_seg
      FROM events
    )
    SELECT event_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id, err_seg ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS purchases_since_error
    FROM seg
    """,
    tier="P3",
)
def stream_stateful_counter(spark, t):
    """Arbitrary per-user running state: purchases since the most recent
    error (resets at each error).

    r8 optimization round (guide §4.1 — prefer built-ins over the
    Python boundary): the original grouped ``applyInPandas`` shipped
    every event row JVM→Python→JVM and walked them in an interpreted
    per-row loop — 5.0 s warm at sf0.1, almost entirely
    FlatMapGroupsInPandas. The running state is expressible as window
    algebra over ONE partition key (user_id), so the whole op now runs
    as codegen'd JVM windows with a single exchange:

        p_run  = running purchase count per user
        e_mark = p_run at the most recent error row (running MAX works
                 because p_run is non-decreasing, so the latest error's
                 p_run is also the largest)
        purchases_since_error = p_run - coalesce(e_mark, 0)

    At an error row the result is p_run − p_run = 0 (reset); purchases
    after it count from that mark — exactly the state machine. All
    integer arithmetic; the unchanged gaps-and-islands oracle hash
    proves the equivalence. The stateful STREAMING surface this op's
    batch form mirrors is still exercised end-to-end by
    ``transformWithStateInPandas`` in tests/test_streaming.py (the same
    registry-carries-the-fast-form precedent as udtf_table_sessionize,
    bench.py note).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p_run = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(w)
    stepped = t["events"].select(
        "event_id", "user_id", "ts", "event_type", p_run.alias("p_run")
    )
    e_mark = F.max(
        F.when(F.col("event_type") == "error", F.col("p_run"))
    ).over(w)
    return stepped.select(
        "event_id",
        (F.col("p_run") - F.coalesce(e_mark, F.lit(0)))
        .cast("long")
        .alias("purchases_since_error"),
    )


# ------------------------------------------------------- stream-stream join

def view_purchase_interval_join(
    views: DataFrame, purchases: DataFrame, watermarked: bool = True
) -> DataFrame:
    """Attribute each purchase to the view events of the same user in the
    preceding hour — the canonical watermarked stream-stream inner join.

    Under ``readStream`` both sides shuffle on ``user_id`` and buffer in
    the state store; the event-time range condition plus the watermarks
    lets Spark evict a buffered view once the purchase-side watermark
    passes ``view_ts + 1 hour`` (state is bounded by watermark × rate,
    never by stream length). The same expression under ``spark.read`` is
    a plain shuffle join on user_id with a range filter — which is what
    the DuckDB oracle hashes.
    """
    v = views.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if watermarked:
        v = v.withWatermark("view_ts", "1 hour")
        p = p.withWatermark("purchase_ts", "2 hours")
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") < F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select(
        "view_id", "purchase_id", "user_id", r4("purchase_value").alias("purchase_value")
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id AS user_id, round(p.value, 4) AS purchase_value
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
    tier="P3",
)
def stream_stream_join(spark, t):
    """Batch form of ``view_purchase_interval_join`` (streaming replay
    equivalence in tests/test_streaming.py)."""
    ev = t["events"]
    return view_purchase_interval_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        watermarked=False,
    )


@register(
    "stream_upsert_materialize",
    oracle="""
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           round(value, 4) AS last_value
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    tier="P3",
)
def stream_upsert_materialize(spark, t):
    """Incrementally materialized latest-per-key state: a real
    Structured Streaming job feeds the events table through 3
    chronological micro-batches, and ``foreachBatch`` MERGEs each batch
    into a keyed state table (union → keep newest per user_id → write) —
    the canonical "streaming upsert into a serving table" pattern. The
    final state is exactly the batch latest-per-key query, so unlike
    most stream-only behaviors this one is hash-checked cross-engine.

    State writes ping-pong between versioned directories (read vN,
    write vN+1) because plain parquet can't MERGE in place; on a real
    deployment the batch body is one ``MERGE INTO`` against a table
    format, same dataflow. State size is bounded by |keys|, not by the
    stream — the property that makes the pattern viable at 100 TB.

    The chronological feed is written BY SPARK in one job:
    ``repartitionByRange(3, ts, event_id)`` range-partitions the table
    into three time-ordered parts, each written as one file; the driver
    only renames part files and stamps ascending mtimes so the file
    source replays them oldest-first. (The final state is latest-per-key
    and therefore invariant to the exact batch boundaries.)
    """
    events = t["events"]
    tmp = scratch_mkdtemp(prefix="upsert_feed_")
    feed_dir = os.path.join(tmp, "feed")
    os.makedirs(feed_dir)

    stage = os.path.join(tmp, "stage")
    (
        events.select("event_id", "ts", "user_id", "event_type", "value")
        .repartitionByRange(3, "ts", "event_id")
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .parquet(stage)
    )
    # part-0000N name order == range order == chronological order; stamp
    # strictly increasing mtimes so FileStreamSource's modified-time
    # ordering agrees with the lexicographic batch names.
    t0 = time.time()
    for i, src in enumerate(sorted(glob.glob(os.path.join(stage, "part-*.parquet")))):
        dst = os.path.join(feed_dir, f"batch_{i}.parquet")
        os.rename(src, dst)
        os.utime(dst, (t0 + i, t0 + i))

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    state_version = [0]

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        latest_batch = batch_df
        if state_version[0]:
            prev = sp.read.parquet(
                os.path.join(tmp, f"state_v{state_version[0]}")
            )
            latest_batch = prev.unionByName(batch_df)
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        new_state = (
            latest_batch.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        state_version[0] += 1
        new_state.write.mode("overwrite").parquet(
            os.path.join(tmp, f"state_v{state_version[0]}")
        )

    query = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    if not query.awaitTermination(120):
        query.stop()
        raise TimeoutError(
            "stream_upsert_materialize replay did not finish within 120 s"
        )
    final = spark.read.parquet(os.path.join(tmp, f"state_v{state_version[0]}"))
    return final.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        r4("value").alias("last_value"),
    )


def enrich_with_segment(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static enrichment transform: purchase events joined to the
    (static, broadcast) customer dimension, folded to per-segment
    revenue. Pure DataFrame → DataFrame so the same function runs under
    batch (oracle-hashed) and readStream (replay-tested)."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("user_id") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            r4(F.sum("value")).alias("revenue"),
        )
    )


@register(
    "stream_static_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_purchases,
           round(SUM(e.value), 4) AS revenue
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    GROUP BY c.c_mktsegment
    """,
    tier="P2",
)
def stream_static_join(spark, t):
    """Stream-static dimension join — the enrichment pattern every
    production stream runs (events arrive, dimensions sit in a table):
    purchases joined to the customer dimension per micro-batch, rolled
    up to per-segment revenue. Under ``readStream`` Spark re-binds the
    static side each micro-batch (a snapshot join — no watermark or
    state needed on the static side, unlike stream-stream joins);
    tests/test_streaming.py replays this transform and asserts the
    final state equals this batch form.

    Scale: the dimension projection broadcasts (two columns); the
    streaming aggregate's state is |segments| rows.
    """
    return enrich_with_segment(t["events"], t["customer"])


def hourly_type_counts(events: DataFrame) -> DataFrame:
    """The streamable half of windowed top-k: per (hour, type) counts.
    Top-k ranking is NOT streamable in append mode (a rank can change
    until the window closes), so the rank runs downstream of the sink —
    in batch, immediately below; in streaming, on the sink table
    (tests/test_streaming.py replays exactly that split)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"), "event_type", "n_events"
        )
    )


def rank_topk_per_window(counts: DataFrame, k: int = 2) -> DataFrame:
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("window_start", "event_type", "n_events", "rk")
    )


@register(
    "stream_windowed_topk",
    oracle="""
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY window_start
               ORDER BY n_events DESC, event_type) AS rk
      FROM counts
    )
    SELECT window_start, event_type, n_events, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 2
    """,
    tier="P2",
)
def stream_windowed_topk(spark, t):
    """Top-2 event types per hourly window — the trending-now /
    leaderboard-per-window shape. The aggregation half
    (``hourly_type_counts``) is a standard watermarked windowed count
    that streams in append mode; the RANK half cannot (a window's
    ranking is only final when the watermark closes the window), so it
    runs downstream of the sink — the two-stage split every streaming
    top-k deploys, and the replay test drives exactly that topology.

    Rank windows partition by window_start (calendar-bounded per
    partition: ≤|event types| rows), so no partition-less window and no
    state beyond the open windows' counts.
    """
    return rank_topk_per_window(hourly_type_counts(t["events"]), k=2)


@register(
    "stream_lake_sink",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events GROUP BY event_type
    """,
    tier="P2",
)
def stream_lake_sink(spark, t):
    """Streaming sink INTO the transaction-log table format
    (operators/lake.py): the events table replays through 3
    chronological micro-batches and ``foreachBatch`` commits each one
    as a lake version — data files written by Spark, footer zone maps
    collected, the atomic put-if-absent JSON commit published per
    batch. This is what a Delta/Iceberg streaming sink does under the
    hood: exactly-once via a txn action per commit ({appId, batchId},
    operators/lake.py::sink_commit) — a replayed batch finds its txn
    already in the log and skips BEFORE writing, and because batch ids
    are decoupled from version numbers the sink stays correct on a
    table shared with concurrent writers (an interleaved commit just
    shifts which version the claim lands on).

    The final snapshot read must fold to exactly the batch answer over
    the whole table (hash-checked); tests/test_streaming.py asserts the
    version history itself — one commit per micro-batch, cumulative row
    counts monotone to the table total.
    """
    from ..operators.lake import _read_version

    root = _ingest_events_to_lake(spark, t)
    return (
        _read_version(spark, root)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


# Root of the most recent _ingest_events_to_lake table, recorded so
# tests inspect the exact table the operator built instead of globbing
# /tmp/lake_sink_* by mtime (which picks a stale or parallel-test root).
LAST_SINK_ROOT: str | None = None


def _ingest_events_to_lake(spark, t) -> str:
    """The sink's ingestion path, shared with the lakehouse-IVM
    composite: replay events through 3 chronological micro-batches,
    sink_commit each into a fresh lake table, return the table root."""
    from ..operators.lake import sink_commit

    events = t["events"]
    tmp = scratch_mkdtemp(prefix="lake_sink_")
    feed_dir = os.path.join(tmp, "feed")
    os.makedirs(feed_dir)
    root = os.path.join(tmp, "table")

    stage = os.path.join(tmp, "stage")
    (
        events.select("event_id", "ts", "event_type", "value")
        .repartitionByRange(3, "ts", "event_id")
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .parquet(stage)
    )
    t0 = time.time()
    for i, src in enumerate(
        sorted(glob.glob(os.path.join(stage, "part-*.parquet")))
    ):
        dst = os.path.join(feed_dir, f"batch_{i}.parquet")
        os.rename(src, dst)
        os.utime(dst, (t0 + i, t0 + i))

    schema = "event_id long, ts timestamp, event_type string, value double"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        # sink_commit is check-then-write: a replayed batch (restart
        # with a lost streaming checkpoint) finds its txn action in the
        # log and returns before touching the data dir — writing first
        # would wipe the committed files via the overwrite. Driven
        # through stop/restart and shared-table interleaving in
        # tests/test_streaming.py and tests/test_units.py.
        sink_commit(
            root,
            "stream_lake_sink",
            int(batch_id),
            batch_df.select(
                "event_id",
                "event_type",
                F.round(F.col("value") * 100)
                .cast("bigint")
                .alias("value_cents"),
            ),
            ["event_id"],
        )

    query = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
        .writeStream.foreachBatch(commit_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    if not query.awaitTermination(120):
        query.stop()
        raise TimeoutError("stream_lake_sink replay did not finish in 120 s")
    global LAST_SINK_ROOT
    LAST_SINK_ROOT = root
    return root


@register(
    "pipeline_lakehouse_ivm",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events GROUP BY event_type
    """,
    tier="P2",
)
def pipeline_lakehouse_ivm(spark, t):
    """End-to-end lakehouse maintenance: events stream into the
    transaction-log table via the exactly-once sink (3 micro-batch
    commits), and a per-event-type rollup is maintained PURELY from the
    commit log — one partial aggregate over each commit's added files,
    folded together. No snapshot read, no full-table scan: every data
    file flows through maintenance exactly once, as its commit lands
    (asserted structurally in tests/test_units.py). The maintained
    state must hash-match the batch answer over the raw events table —
    the continuous-ingestion + incremental-view workflow a training
    -data pipeline runs against a 100 TB table, where recomputing the
    view per commit is the thing you cannot afford. Append-only commits
    need only +1 folds; the removes case of the same algebra is
    lake_incremental_rollup (operators/lake.py), and the multi-commit
    composition of both is proven in
    tests/test_units.py::test_incremental_rollup_composes_across_a_multi_commit_history.
    """
    import json

    from ..operators.lake import _log_dir, _versions

    root = _ingest_events_to_lake(spark, t)
    partials = None
    for v in _versions(root):
        with open(os.path.join(_log_dir(root), f"{v:08d}.json")) as fh:
            entry = json.load(fh)
        part = (
            spark.read.parquet(
                *[os.path.join(root, a["path"]) for a in entry["adds"]]
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value_cents").alias("value_cents"),
            )
        )
        partials = part if partials is None else partials.unionByName(part)
    return (
        partials.groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


def cms_sketch_6h(events: DataFrame, d: int = 4, w: int = 64) -> DataFrame:
    """Windowed count-min sketch as a streaming aggregate: per 6-hour
    tumbling window, a d×w counter table over ``user_id`` (state is
    d·w = 256 counters per window regardless of user cardinality —
    the bounded-state trick that makes per-key counting viable when
    the key space outgrows per-key streaming state). Pure dual-mode
    transform: hash fan-out is a stateless projection, the counter
    table is an ordinary windowed count, so the identical code runs
    under readStream (update/complete mode) and batch."""
    from ..functions.portable_hash import ph60

    hb = events.withWatermark("ts", "1 hour").select(
        "ts",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hash_id"),
                        (ph60("user_id", f"shh{i}") % w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("hb"),
    )
    return (
        hb.groupBy(
            F.window("ts", "6 hours").alias("win"),
            F.col("hb.hash_id").alias("hash_id"),
            F.col("hb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("counter"))
        .select(
            F.col("win.start").alias("window_start"),
            "hash_id",
            "bucket",
            "counter",
        )
    )


@register(
    "stream_heavy_hitters",
    oracle="""
    WITH ks AS (SELECT unnest([0, 1, 2, 3]) AS hash_id),
    ev AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, user_id
      FROM events
    ),
    hb AS (
      SELECT window_start, hash_id,
             ('0x' || substr(md5('shh' || hash_id || ':' || user_id), 1, 15))::ubigint
               % 64 AS bucket
      FROM ev, ks
    ),
    sketch AS (
      SELECT window_start, hash_id, bucket, COUNT(*) AS counter
      FROM hb GROUP BY 1, 2, 3
    ),
    top5 AS (
      SELECT user_id FROM ev GROUP BY user_id
      ORDER BY COUNT(*) DESC, user_id LIMIT 5
    ),
    exact AS (
      SELECT window_start, user_id, COUNT(*) AS exact_n
      FROM ev JOIN top5 USING (user_id) GROUP BY 1, 2
    ),
    probe AS (
      SELECT e.window_start, e.user_id, e.exact_n, k.hash_id,
             ('0x' || substr(md5('shh' || k.hash_id || ':' || e.user_id), 1, 15))::ubigint
               % 64 AS bucket
      FROM exact e, ks k
    )
    SELECT p.window_start, p.user_id, p.exact_n,
           CAST(MIN(s.counter) AS BIGINT) AS cms_estimate
    FROM probe p
    JOIN sketch s USING (window_start, hash_id, bucket)
    GROUP BY p.window_start, p.user_id, p.exact_n
    """,
    tier="P3",
)
def stream_heavy_hitters(spark, t):
    """Streaming heavy hitters: maintain a 6-hour-windowed count-min
    sketch (``cms_sketch_6h`` — the streaming-state form of
    ``agg_count_min_sketch``) and probe it for the top-5 users,
    reporting exact vs estimated counts per window. The sketch is the
    part that streams — 256 counters per window however many users
    exist, mergeable across micro-batches by construction since it IS
    a windowed count; replay equivalence is asserted in
    tests/test_streaming.py. The probe/report half is the batch
    consumer every sketch pipeline has (read the materialized counter
    table, min over d rows per key).

    The md5-based portable hash family (seeds shh0..shh3) lets DuckDB
    rebuild the identical counter table, so the hash check covers the
    sketch CONTENT, not just the report: over/under-counting a single
    micro-batch's fan-out lands in the mismatch. CMS guarantees
    estimate ≥ exact per (window, user); the unit property is asserted
    structurally in tests.
    """
    from ..functions.portable_hash import ph60

    events = t["events"]
    sketch = cms_sketch_6h(events)
    ev = events.select(
        F.window("ts", "6 hours").alias("win"), "user_id"
    ).select(F.col("win.start").alias("window_start"), "user_id")
    top5 = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(5)
        .select("user_id")
    )
    exact = (
        ev.join(F.broadcast(top5), "user_id")
        .groupBy("window_start", "user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    probe = exact.select(
        "window_start",
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hash_id"),
                        (ph60("user_id", f"shh{i}") % 64).alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("hb"),
    ).select(
        "window_start", "user_id", "exact_n", "hb.hash_id", "hb.bucket"
    )
    return (
        probe.join(sketch, ["window_start", "hash_id", "bucket"])
        .groupBy("window_start", "user_id", "exact_n")
        .agg(F.min("counter").alias("cms_estimate"))
    )


def value_hist_6h(events: DataFrame) -> DataFrame:
    """6-hour-windowed fixed-bin value histogram as a streaming
    aggregate: per tumbling window, 32 counters of ``value`` (bin width
    16, top bin clamped) — the quantile analogue of ``cms_sketch_6h``:
    state is 32 integers per window whatever the event volume, and the
    histogram is an ordinary windowed count, so the identical code runs
    under readStream and batch (replay equivalence asserted in
    tests/test_streaming.py). Bin width 16 is a power of two, so
    ``value / 16`` is EXACT in binary floating point — no engine can
    land a boundary value in a different bin."""
    b = F.least(F.lit(31), F.floor(F.col("value") / 16)).cast("long")
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("window_start"), "bin", "c")
    )


@register(
    "stream_quantile_histogram",
    oracle="""
    WITH ev AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
             LEAST(31, CAST(floor(value / 16) AS BIGINT)) AS bin
      FROM events
    ),
    h AS (SELECT window_start, bin, COUNT(*) AS c FROM ev GROUP BY 1, 2),
    cum AS (
      SELECT window_start, bin, c,
             SUM(c) OVER (PARTITION BY window_start ORDER BY bin) AS cum,
             SUM(c) OVER (PARTITION BY window_start) AS n
      FROM h
    )
    SELECT window_start,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MIN(CASE WHEN 2 * cum >= n
                         THEN (bin + 1) * 16 END) AS BIGINT) AS p50_hi,
           CAST(MIN(CASE WHEN 10 * cum >= 9 * n
                         THEN (bin + 1) * 16 END) AS BIGINT) AS p90_hi
    FROM cum GROUP BY window_start
    """,
    tier="P2",
)
def stream_quantile_histogram(spark, t):
    """Streaming windowed quantiles via the mergeable fixed-bin
    histogram — the streaming face of ``agg_histogram_quantile_merge``:
    ``value_hist_6h`` maintains 32 counters per 6-hour window as
    ordinary streaming state (micro-batch increments merge by
    addition, the property the replay test pins), and the batch
    consumer reads P50/P90 off each window's cumulative histogram as
    integer bin edges with exact cross-multiplied thresholds.

    This is how you get percentile dashboards over an unbounded stream
    without per-event state: latency/value quantiles per window cost
    O(windows·32) state total, versus unbounded buffers for exact
    streaming percentiles. The histogram stage streams; the edge
    readout is the tiny batch query every sketch pipeline has
    (``stream_heavy_hitters`` splits the same way). Window cumsum runs
    on ≤ 32 rows per window — partition-bounded.
    """
    from pyspark.sql import Window

    hist = value_hist_6h(t["events"])
    w_cum = (
        Window.partitionBy("window_start")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("window_start")
    cum = hist.select(
        "window_start",
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    edge = (F.col("bin") + 1) * 16
    return cum.groupBy("window_start").agg(
        F.max("n").alias("n_events"),
        F.min(F.when(2 * F.col("cum") >= F.col("n"), edge)).alias("p50_hi"),
        F.min(
            F.when(10 * F.col("cum") >= 9 * F.col("n"), edge)
        ).alias("p90_hi"),
    )


def hll_registers_6h(events: DataFrame) -> DataFrame:
    """6-hour-windowed portable-HLL register table as a streaming
    aggregate: per tumbling window, ≤256 (register, max-rank) rows of
    ``user_id`` — approximate distinct users per window with state
    bounded by m=256 whatever the user cardinality. Register max is
    duplicate-invariant, so no pre-distinct is needed (max IS the
    merge — the same mergeability argument as ``cms_sketch_6h``'s
    counter addition); the identical code runs under readStream and
    batch, replay equivalence asserted in tests/test_streaming.py."""
    from ..functions.portable_hash import hll_rank, ph60
    from ..operators.aggs import _HLL_M, _HLL_W

    h = events.withWatermark("ts", "1 hour").select(
        "ts", ph60("user_id", "hll").alias("h")
    )
    reg = h.select(
        "ts",
        (F.col("h") % _HLL_M).alias("j"),
        hll_rank(F.expr(f"h div {_HLL_M}"), _HLL_W).alias("r"),
    )
    return (
        reg.groupBy(F.window("ts", "6 hours").alias("w"), "j")
        .agg(F.max("r").alias("mj"))
        .select(F.col("w.start").alias("window_start"), "j", "mj")
    )


@register(
    "stream_hll_distinct",
    oracle="""
    WITH u AS (
      SELECT DISTINCT time_bucket(INTERVAL '6 hours', ts) AS window_start,
             user_id
      FROM events
    ),
    h AS (SELECT window_start,
                 ('0x' || substr(md5('hll:' || user_id), 1, 15))::ubigint AS h
          FROM u),
    reg AS (SELECT window_start, h % 256 AS j,
                   CASE WHEN h // 256 = 0 THEN 53
                        ELSE strpos(lpad(bin(h // 256), 52, '0'), '1')
                   END AS r
            FROM h),
    rm AS (SELECT window_start, j, MAX(r) AS mj FROM reg GROUP BY 1, 2),
    s AS (SELECT window_start,
                 (SUM(1::BIGINT << (53 - mj))
                  + (256 - COUNT(*)) * (1::BIGINT << 53))::BIGINT AS s_int,
                 256 - COUNT(*) AS v
          FROM rm GROUP BY window_start
    ),
    ex AS (
      SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM u GROUP BY window_start
    )
    SELECT s.window_start,
           round(CASE WHEN s.v > 0 AND 4.2399330249068963e+20 / s.s_int <= 640.0
                      THEN 256.0 * ln(256.0 / s.v)
                      ELSE 4.2399330249068963e+20 / s.s_int END, 4)
             AS est_users,
           ex.n_exact
    FROM s JOIN ex USING (window_start)
    """,
    tier="P3",
)
def stream_hll_distinct(spark, t):
    """Streaming approximate distinct users per 6-hour window via the
    portable HLL register table (``hll_registers_6h``) — the streaming
    face of ``agg_approx_count_distinct`` and the third windowed
    sketch state after the count-min counter table and the fixed-bin
    histogram: distinct-user dashboards over an unbounded stream at
    O(windows·256) total state, where exact streaming distinct needs
    per-user state.

    The register stage streams (windowed MAX is the HLL merge); the
    estimate readout is the tiny batch fold every sketch pipeline has
    — exact-integer register sums (`shiftleft`, no float log2 ranks)
    plus one division and one `ln`, the r2-established cross-engine
    HLL discipline. Exact per-window distinct rides along for the
    accuracy audit the dashboards want.
    """
    from ..operators.aggs import _hll_estimate

    regs = hll_registers_6h(t["events"])
    est = _hll_estimate(regs, ["window_start"], "est_users")
    exact = (
        t["events"]
        .select(F.window("ts", "6 hours").alias("w"), "user_id")
        .select(F.col("w.start").alias("window_start"), "user_id")
        .groupBy("window_start")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return est.join(exact, "window_start")
