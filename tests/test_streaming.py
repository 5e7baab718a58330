"""Streaming equivalence (SURVEY.md §5.3-4): replay the events table
through Structured Streaming (file source, bounded micro-batches,
availableNow) and assert the final state equals the batch transform —
the dual-mode design contract of streaming/ops.py."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from splio_etl_aggregations_spark.sources.loader import load
from splio_etl_aggregations_spark.streaming.ops import (
    dedup_by_event_id,
    session_30m,
    sliding_1h_15m,
    tumbling_hourly,
    view_purchase_interval_join,
)

from .conftest import SF_SMALL, SF_T2


def _replay(spark, transform, n_files: int = 4, mode: str = "append"):
    """Write events as n ordered files, stream them through `transform`
    one file per micro-batch, return the memory-sink result."""
    events = load(spark, SF_SMALL)["events"]
    tmp = tempfile.mkdtemp(prefix="replay_")
    feed = os.path.join(tmp, "feed")
    # deterministic file split, ordered by time → watermark advances sanely
    (
        events.orderBy("ts", "event_id")
        .repartitionByRange(n_files, "ts")
        .write.parquet(feed)
    )
    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    sink = f"replay_{uuid.uuid4().hex[:8]}"
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_replay_equals_batch(spark):
    # complete mode: append only emits watermark-finalized windows, and the
    # tail windows never finalize on a bounded replay
    batch = tumbling_hourly(load(spark, SF_SMALL)["events"])
    stream = _replay(spark, tumbling_hourly, mode="complete")
    assert _rows(stream) == _rows(batch)


def test_sliding_replay_equals_batch(spark):
    batch = sliding_1h_15m(load(spark, SF_SMALL)["events"])
    stream = _replay(spark, sliding_1h_15m, mode="complete")
    assert _rows(stream) == _rows(batch)


def test_session_replay_equals_batch(spark):
    # no watermark on the replay: the session-merge operator evicts
    # watermark-expired sessions even in complete mode
    batch = session_30m(load(spark, SF_SMALL)["events"])
    stream = _replay(spark, lambda df: session_30m(df, watermark=None), mode="complete")
    assert _rows(stream) == _rows(batch)


def test_dedup_replay_drops_injected_duplicates(spark):
    """Feed each event twice (two identical files) — streaming dedup must
    collapse them to the batch-distinct result."""
    events = load(spark, SF_SMALL)["events"]
    tmp = tempfile.mkdtemp(prefix="dupfeed_")
    feed = os.path.join(tmp, "feed")
    events.coalesce(1).write.parquet(feed)
    # duplicate the single data file under a later-sorting name
    data = [f for f in os.listdir(feed) if f.endswith(".parquet")][0]
    import shutil

    shutil.copy(os.path.join(feed, data), os.path.join(feed, "z_dup.parquet"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    sink = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_by_event_id(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark.table(sink))
    want = _rows(dedup_by_event_id(events))
    assert got == want  # 2× input, 1× output


@pytest.mark.parametrize("sf", [SF_SMALL, SF_T2], ids=["sf0.001", "sf0.01"])
def test_stateful_counter_streaming_equals_batch(spark, sf):
    """Run the purchases-since-error state machine INCREMENTALLY with
    applyInPandasWithState (per-key state carried across micro-batches)
    and assert the final per-event outputs equal the batch applyInPandas
    form of stream_stateful_counter — at two scales, so state carried
    across micro-batch boundaries is exercised on ~10× more keys/rows
    than the small fixture (VERDICT r1 stretch).

    (Spark 4's transformWithStateInPandas would be the newer surface for
    this, but its worker requires google.protobuf, absent from this
    container — applyInPandasWithState is pure Arrow and expresses the
    same per-key state contract.)"""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from splio_etl_aggregations_spark.registry import get

    def count_purchases(key, pdfs, state: GroupState):
        c = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        vals = []
        for et in pdf["event_type"]:
            if et == "error":
                c = 0
            elif et == "purchase":
                c += 1
            vals.append(c)
        state.update((c,))
        yield pd.DataFrame(
            {"event_id": pdf["event_id"], "purchases_since_error": vals}
        )

    def transform(stream):
        return (
            stream.select("event_id", "user_id", "ts", "event_type")
            .groupBy("user_id")
            .applyInPandasWithState(
                count_purchases,
                outputStructType="event_id long, purchases_since_error long",
                stateStructType="c long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    # Order-sensitive state machine ⇒ micro-batch order must follow event
    # time. FileStreamSource orders by modification time, so write the
    # ts-sorted chunks with strictly increasing mtimes.
    events = load(spark, sf)["events"]
    tmp = tempfile.mkdtemp(prefix="stateful_feed_")
    feed = os.path.join(tmp, "feed")
    os.makedirs(feed)
    pdf = (
        events.select("event_id", "user_id", "ts", "event_type")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    n_files = 4
    kw = dict(coerce_timestamps="us", allow_truncated_timestamps=True)
    chunk = -(-len(pdf) // n_files)
    base_t = 1_700_000_000
    for i in range(n_files):
        path = os.path.join(feed, f"batch_{i}.parquet")
        pdf.iloc[i * chunk : (i + 1) * chunk].to_parquet(path, **kw)
        os.utime(path, (base_t + i * 10, base_t + i * 10))

    stream_df = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    sink = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        transform(stream_df)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    assert q.awaitTermination(240), "stateful replay timed out"
    batch = get("stream_stateful_counter").run(spark, sf)
    assert _rows(spark.table(sink)) == _rows(batch)


def test_foreachbatch_parquet_sink_roundtrip(spark):
    """Stream events through foreachBatch into an append-only parquet
    sink (the canonical production sink pattern: per-micro-batch atomic
    writes) and assert the re-read equals the batch projection."""
    events = load(spark, SF_SMALL)["events"]
    tmp = tempfile.mkdtemp(prefix="fb_sink_")
    feed = os.path.join(tmp, "feed")
    out = os.path.join(tmp, "out")
    events.orderBy("ts", "event_id").repartitionByRange(3, "ts").write.parquet(feed)

    def write_batch(batch_df, batch_id: int) -> None:
        (
            batch_df.select("event_id", "user_id", "event_type", "value")
            .write.mode("append")
            .parquet(out)
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark.read.parquet(out))
    want = _rows(events.select("event_id", "user_id", "event_type", "value"))
    assert got == want


def test_late_data_rows_are_dropped(spark):
    """The stream_late_data query must drop the withheld first-hour rows:
    its total event count is strictly below the batch total, and the
    on-time windows match the batch aggregation exactly."""
    from splio_etl_aggregations_spark.registry import get

    df = get("stream_late_data").run(spark, SF_SMALL)
    streamed = {r["window_start"]: r["n_events"] for r in df.collect()}
    events = load(spark, SF_SMALL)["events"]
    batch = {
        r["window_start"]: r["n"]
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(streamed.values()) < sum(batch.values())
    # every window the stream did emit agrees with batch
    for w, n in streamed.items():
        assert batch.get(w) == n, (w, n, batch.get(w))


def test_stream_stream_join_replay_equals_batch(spark):
    """Watermarked stream-stream inner join: replay events as time-ordered
    micro-batches, join the view-side stream to the purchase-side stream
    of the SAME source (two filters over one file feed — both sides
    advance together), and assert the emitted pairs equal the batch join.
    Inner-join matches emit as soon as both rows have arrived, so the
    bounded availableNow replay must surface every pair.

    The feed is written with strictly increasing mtimes (FileStreamSource
    orders batches by mtime, not content): an out-of-order file would
    legitimately advance the watermark past earlier events and DROP their
    pairs — that's watermark semantics, not a join bug, and exactly why
    the unordered `_replay` helper can't be used here."""

    def joined(stream):
        return view_purchase_interval_join(
            stream.filter(F.col("event_type") == "view"),
            stream.filter(F.col("event_type") == "purchase"),
        )

    events = load(spark, SF_SMALL)["events"]
    tmp = tempfile.mkdtemp(prefix="ssjoin_feed_")
    feed = os.path.join(tmp, "feed")
    os.makedirs(feed)
    pdf = events.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    n_files = 4
    kw = dict(coerce_timestamps="us", allow_truncated_timestamps=True)
    chunk = -(-len(pdf) // n_files)
    base_t = 1_700_000_000
    for i in range(n_files):
        path = os.path.join(feed, f"batch_{i}.parquet")
        pdf.iloc[i * chunk : (i + 1) * chunk].to_parquet(path, **kw)
        os.utime(path, (base_t + i * 10, base_t + i * 10))

    stream_df = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    sink = f"ssjoin_{uuid.uuid4().hex[:8]}"
    q = (
        joined(stream_df)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    assert q.awaitTermination(120), "stream-stream join replay timed out"
    batch = view_purchase_interval_join(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
        watermarked=False,
    )
    got = _rows(spark.table(sink))
    assert got == _rows(batch)
    assert len(got) > 0


def test_static_join_replay_equals_batch(spark):
    """Stream-static enrichment: the per-micro-batch dimension join over
    a 4-file replay converges to the batch join's state."""
    from splio_etl_aggregations_spark.streaming.ops import enrich_with_segment

    tables = load(spark, SF_SMALL)
    customer = tables["customer"]
    batch = enrich_with_segment(tables["events"], customer)
    stream = _replay(
        spark, lambda df: enrich_with_segment(df, customer), mode="complete"
    )
    assert _rows(stream) == _rows(batch)


def test_upsert_materialize_replay_equals_batch(spark):
    """stream_upsert_materialize IS a streaming replay (3 chronological
    micro-batches foreachBatch-merged into a keyed state table); assert
    its final state equals the batch latest-per-key query — the
    engine-side twin of its DuckDB oracle, completing one replay test
    per §2-I operator."""
    from pyspark.sql import Window as W

    from splio_etl_aggregations_spark.registry import get

    got = get("stream_upsert_materialize").run(spark, SF_SMALL)
    events = load(spark, SF_SMALL)["events"]
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    batch = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.round("value", 4).alias("last_value"),
        )
    )
    assert _rows(got) == _rows(batch)


def test_windowed_topk_replay_equals_batch(spark):
    """Stream the count half (windowed counts, complete mode), rank the
    sink in batch, and match the registered batch top-k — the two-stage
    streaming-leaderboard topology stream_windowed_topk documents."""
    from splio_etl_aggregations_spark.streaming.ops import (
        hourly_type_counts,
        rank_topk_per_window,
    )

    batch = rank_topk_per_window(
        hourly_type_counts(load(spark, SF_SMALL)["events"]), k=2
    )
    sink = _replay(spark, hourly_type_counts, mode="complete")
    assert _rows(rank_topk_per_window(sink, k=2)) == _rows(batch)


def test_lake_sink_commits_one_version_per_batch(spark):
    """stream_lake_sink: the version history must show one append
    commit per micro-batch with cumulative row counts monotone to the
    table total — the log IS the replay record."""
    from splio_etl_aggregations_spark.operators import lake
    from splio_etl_aggregations_spark.registry import get
    from splio_etl_aggregations_spark.streaming import ops as stream_ops

    df = get("stream_lake_sink").run(spark, SF_SMALL)
    total = df.agg(F.sum("n_events")).collect()[0][0]
    # the op records the exact table root it built — globbing /tmp by
    # mtime picks a stale or parallel-test root instead
    root = stream_ops.LAST_SINK_ROOT
    assert root, "no lake_sink table found"
    versions = lake._versions(root)
    assert versions == [0, 1, 2], versions
    cum = [
        sum(a["rows"] for a in lake._snapshot(root, v)) for v in versions
    ]
    assert cum == sorted(cum) and cum[-1] == total, (cum, total)
    assert all(b > a for a, b in zip(cum, cum[1:])), cum


def test_lake_sink_restart_is_exactly_once(spark):
    """Drive the streaming sink to completion, then restart it with a
    lost streaming checkpoint: all three micro-batches replay under
    their original ids, the log's check-then-skip turns every one into
    a no-op, and the final table equals the batch answer with exactly
    one commit per batch id — the restart-safety half of exactly-once,
    anchored in the LAKE log rather than the streaming checkpoint."""
    import glob as _glob
    import os as _os
    import tempfile
    import time as _time

    from pyspark.sql import functions as FF
    from splio_etl_aggregations_spark.operators import lake
    from splio_etl_aggregations_spark.operators.lake import (
        _read_version, sink_commit,
    )
    from splio_etl_aggregations_spark.sources.loader import load

    events = load(spark, SF_SMALL)["events"]
    tmp = tempfile.mkdtemp(prefix="lake_sink_restart_")
    feed, root, ckpt = [_os.path.join(tmp, d) for d in ("feed", "table", "ck")]
    _os.makedirs(feed)
    stage = _os.path.join(tmp, "stage")
    (events.select("event_id", "ts", "event_type", "value")
     .repartitionByRange(3, "ts", "event_id")
     .sortWithinPartitions("ts", "event_id")
     .write.mode("overwrite").parquet(stage))
    t0 = _time.time()
    for i, src in enumerate(sorted(_glob.glob(_os.path.join(stage, "part-*.parquet")))):
        dst = _os.path.join(feed, f"batch_{i}.parquet")
        _os.rename(src, dst)
        _os.utime(dst, (t0 + i, t0 + i))
    schema = "event_id long, ts timestamp, event_type string, value double"
    seen = []

    def commit_batch(bdf, bid):
        # the registered sink's txn-action idempotence: a replayed
        # batch must not overwrite its committed data dir
        seen.append(int(bid))
        sink_commit(
            root, "restart_test", int(bid),
            bdf.select("event_id", "event_type",
                       FF.round(FF.col("value") * 100).cast("bigint")
                       .alias("value_cents")),
            ["event_id"])

    def start():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(feed)
                .writeStream.foreachBatch(commit_batch)
                .option("checkpointLocation", ckpt).start())

    # first run: drain all three micro-batches to completion
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(feed)
         .writeStream.foreachBatch(commit_batch)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    assert q.awaitTermination(120)
    assert lake._versions(root) == [0, 1, 2]
    # force a deterministic full replay: restart with a FRESH streaming
    # checkpoint (the checkpoint-loss disaster). Spark reprocesses all
    # three feed files as batches 0/1/2 again (same ids: mtime order ×
    # maxFilesPerTrigger=1), and every commit must hit the
    # check-then-skip path — the lake log, not the streaming
    # checkpoint, is what makes the sink exactly-once. (Editing the
    # existing checkpoint in place is blocked by Spark 4's
    # concurrent-modification fencing, which is itself the first line
    # of defense this test leans past.)
    n_seen_before = len(seen)
    q2 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(feed)
          .writeStream.foreachBatch(commit_batch)
          .trigger(availableNow=True)
          .option("checkpointLocation", ckpt + "_lost").start())
    assert q2.awaitTermination(120)
    assert len(seen) == n_seen_before + 3, seen
    for bid in (0, 1, 2):
        assert seen.count(bid) == 2, seen  # each batch ran twice...
    assert lake._versions(root) == [0, 1, 2]  # ...and committed once
    got = {(r["event_type"]): (r["n"], r["cents"]) for r in
           _read_version(spark, root)
           .groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("value_cents").alias("cents")).collect()}
    want = {(r["event_type"]): (r["n"], r["cents"]) for r in
            events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("bigint"))
                 .alias("cents")).collect()}
    assert got == want


def test_lakehouse_ivm_partials_partition_the_commit_history(spark):
    """pipeline_lakehouse_ivm's claim — every data file flows through
    maintenance exactly once — rests on the commit adds partitioning
    the live file set: pairwise disjoint across versions, union equal
    to the final snapshot. Assert that on the sink's log, and that the
    maintained rollup equals both the snapshot rollup and the raw batch
    answer."""
    import os as _os

    from splio_etl_aggregations_spark.operators import lake
    from splio_etl_aggregations_spark.registry import get
    from splio_etl_aggregations_spark.sources.loader import load
    from splio_etl_aggregations_spark.streaming import ops as stream_ops

    df = get("pipeline_lakehouse_ivm").run(spark, SF_SMALL)
    maintained = {r["event_type"]: (r["n_events"], r["value_cents"])
                  for r in df.collect()}
    root = stream_ops.LAST_SINK_ROOT
    assert root
    import json as _json
    per_version = []
    for v in lake._versions(root):
        with open(_os.path.join(lake._log_dir(root), f"{v:08d}.json")) as fh:
            per_version.append({a["path"] for a in _json.load(fh)["adds"]})
    assert len(per_version) == 3
    for i in range(len(per_version)):
        for j in range(i + 1, len(per_version)):
            assert not (per_version[i] & per_version[j])
    live = {a["path"] for a in lake._snapshot(root)}
    assert set().union(*per_version) == live
    snapshot = {r["event_type"]: (r["n"], r["cents"]) for r in
                lake._read_version(spark, root)
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("value_cents").alias("cents")).collect()}
    assert maintained == snapshot
    events = load(spark, SF_SMALL)["events"]
    batch = {r["event_type"]: (r["n"], r["cents"]) for r in
             events.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("cents")).collect()}
    assert maintained == batch


def test_cms_sketch_replay_equals_batch(spark):
    """The windowed count-min counter table must be identical whether
    built in one batch pass or incrementally across micro-batches —
    the mergeability that makes the sketch a valid streaming state."""
    from splio_etl_aggregations_spark.streaming.ops import cms_sketch_6h

    batch = cms_sketch_6h(load(spark, SF_SMALL)["events"])
    stream = _replay(spark, cms_sketch_6h, mode="complete")
    assert _rows(stream) == _rows(batch)


def test_heavy_hitters_estimate_never_undercounts(spark):
    """CMS guarantee: estimate >= exact for every probed (window, user),
    and overshoot stays within the d=4, w=64 collision bound for this
    event volume."""
    from splio_etl_aggregations_spark import register_all
    from splio_etl_aggregations_spark.registry import REGISTRY

    register_all()
    rows = REGISTRY["stream_heavy_hitters"].run(spark, SF_SMALL).collect()
    assert rows, "no heavy hitters probed"
    total = sum(r["exact_n"] for r in rows)  # lower bound on window mass
    for r in rows:
        assert r["cms_estimate"] >= r["exact_n"], (
            f"CMS undercounted {r['user_id']} in {r['window_start']}"
        )
    # sanity: estimates are counts from the same stream, not garbage
    assert all(r["cms_estimate"] <= total * 4 for r in rows)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas requires google.protobuf (its "
    "state-server wire protocol); absent in this environment — the "
    "stateful surface is proven via applyInPandasWithState / the "
    "grouped-state operators instead (stream_stateful_counter)",
)
def test_transform_with_state_sessionize(spark):
    """The Spark-4 ``transformWithStateInPandas`` form of per-user
    sessionization (ValueState carrying last_ts + session_no across
    micro-batches), replayed availableNow over the events fixture and
    asserted equal to the gaps-and-islands window form — the ready
    swap-in seam for environments that ship protobuf. Probed 2026-08-15:
    the processor below reaches Spark's TWS driver worker, which dies at
    `ImportError: google.protobuf.descriptor` before touching state."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class SessionAssigner(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self._st = handle.getValueState("sess", "last_us LONG, sess_no LONG")

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows)).sort_values(["ts_us", "event_id"])
            if self._st.exists():
                last_us, sess_no = self._st.get()
            else:
                last_us, sess_no = None, 0
            out = []
            for us in pdf["ts_us"]:
                us = int(us)
                if last_us is None or us - last_us > 1_800_000_000:
                    sess_no += 1
                last_us = us
                out.append(sess_no)
            self._st.update((int(last_us), int(sess_no)))
            yield pd.DataFrame(
                {"event_id": pdf["event_id"].to_numpy(), "session_no": out}
            )

        def close(self):
            pass

    t = load(spark, SF_SMALL)
    tmp = tempfile.mkdtemp(prefix="tws_feed_")
    feed = t["events"].select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    feed.write.mode("overwrite").parquet(os.path.join(tmp, "feed"))
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    sink = f"tws_sink_{uuid.uuid4().hex[:8]}"
    try:
        src = spark.readStream.schema(
            "event_id long, user_id long, ts_us long"
        ).parquet(os.path.join(tmp, "feed"))
        out = src.groupBy("user_id").transformWithStateInPandas(
            SessionAssigner(), "event_id long, session_no long", "append", "none"
        )
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        assert q.awaitTermination(180)
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    got = spark.table(sink)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = t["events"].select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    ref = (
        e.withColumn(
            "new_s",
            F.when(
                F.lag("us").over(w).isNull()
                | ((F.col("us") - F.lag("us").over(w)) > 1_800_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_no",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("event_id", F.col("session_no").cast("long").alias("session_no"))
    )
    joined = got.withColumnRenamed("session_no", "got").join(ref, "event_id")
    assert joined.filter(F.col("got") != F.col("session_no")).count() == 0
    assert joined.count() == t["events"].count()


def test_value_histogram_replay_equals_batch(spark):
    """The windowed value histogram must be identical whether built in
    one batch pass or incrementally across micro-batches — count
    addition is the merge, same property as the CMS counter table."""
    from splio_etl_aggregations_spark.streaming.ops import value_hist_6h

    batch = value_hist_6h(load(spark, SF_SMALL)["events"])
    stream = _replay(spark, value_hist_6h, mode="complete")
    assert _rows(stream) == _rows(batch)


def test_hll_registers_replay_equals_batch(spark):
    """The windowed HLL register table must be identical whether built
    in one batch pass or incrementally across micro-batches — windowed
    MAX is the HLL merge, the same mergeability argument as the CMS
    counter table and the value histogram."""
    from splio_etl_aggregations_spark.streaming.ops import hll_registers_6h

    batch = hll_registers_6h(load(spark, SF_SMALL)["events"])
    stream = _replay(spark, hll_registers_6h, mode="complete")
    assert _rows(stream) == _rows(batch)
