"""Scans / sources / sinks (SURVEY.md §2-A).

Parquet is the at-rest format for everything; CSV/JSON roundtrips prove
the source/sink surface (rows-only checks — FIXTURES.md is parquet-only).
Pushdown is delegated to Catalyst and *asserted* in tests/test_plans.py
(PushedFilters / ReadSchema on the FileSourceScan), not re-implemented.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources.tmpdirs import LAST_PATHS, tracked_mkdtemp


@register(
    "scan_parquet",
    oracle="SELECT * FROM lineitem",
    tier="P0",
)
def scan_parquet(spark, t):
    """Full-table parquet scan, all columns (vectorized ColumnarBatch read)."""
    return t["lineitem"]


@register(
    "scan_parquet_pushdown",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity < 10
    """,
    tier="P1",
)
def scan_parquet_pushdown(spark, t):
    """Projection+filter scan; Catalyst pushes both into the parquet reader
    (asserted via PushedFilters/ReadSchema in tests/test_plans.py)."""
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
            & (F.col("l_quantity") < 10)
        )
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )


@register(
    "scan_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tier="P2",
)
def scan_csv_roundtrip(spark, t):
    """Write `nation` to CSV with header, read back with an explicit schema
    (never inferred — SURVEY.md §1.4), return the re-read rows. The
    columns are int/plain-string/int, so the roundtrip is lossless and
    the re-read must equal the source table — which IS the oracle (the
    hash-check proves no row/value was mangled in transit)."""
    path = os.path.join(tracked_mkdtemp(prefix="csv_rt_"), "nation_csv")
    t["nation"].write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return spark.read.schema(schema).option("header", "true").csv(path)


@register(
    "scan_json_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    tier="P2",
)
def scan_json_roundtrip(spark, t):
    """Write `supplier` to JSON lines, read back with explicit schema.
    Doubles serialize via Jackson's shortest-roundtrip representation,
    so the re-read is bit-exact and the source table is the oracle."""
    path = os.path.join(tracked_mkdtemp(prefix="json_rt_"), "supplier_json")
    t["supplier"].write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).json(path).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )


@register(
    "source_range",
    oracle="""
    SELECT id, id * 2 AS doubled, id % 7 AS mod7
    FROM range(1, 101) AS t(id)
    """,
    tier="P2",
)
def source_range(spark, t):
    """Generated integer source with computed columns."""
    return spark.range(1, 101).select(
        F.col("id"),
        (F.col("id") * 2).alias("doubled"),
        (F.col("id") % 7).alias("mod7"),
    )


@register(
    "sink_parquet_partitioned",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, COUNT(*) AS n_orders
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tier="P2",
)
def sink_parquet_partitioned(spark, t):
    """Write orders partitioned by order year, re-read, count per partition.

    The re-read exercises partition discovery (the o_year column comes
    back from directory names, not data pages); the hash-check against
    a direct GROUP BY year on the source proves no rows were lost or
    duplicated by the partitioned write.
    """
    path = os.path.join(tracked_mkdtemp(prefix="pq_part_"), "orders_by_year")
    (
        t["orders"]
        .withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy("o_year")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_year")
    )


@register(
    "scan_orc_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
    tier="P2",
)
def scan_orc_roundtrip(spark, t):
    """Write `region` to ORC (Spark's second first-class columnar
    format), read back with an explicit schema — widens the source/sink
    matrix beyond parquet/CSV/JSON; vectorized ORC reads share the same
    ColumnarBatch path as parquet. ORC is lossless, so the source table
    is the oracle."""
    path = os.path.join(tracked_mkdtemp(prefix="orc_rt_"), "region_orc")
    t["region"].write.mode("overwrite").orc(path)
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    return spark.read.schema(schema).orc(path)


@register(
    "source_date_spine",
    oracle="""
    SELECT CAST(d AS DATE) AS day,
           CAST(year(d) AS INTEGER) AS y,
           CAST(month(d) AS INTEGER) AS m,
           CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END AS is_weekend
    FROM generate_series(DATE '2024-01-01', DATE '2024-03-31',
                         INTERVAL 1 DAY) t(d)
    """,
    tier="P2",
)
def source_date_spine(spark, t):
    """Generated calendar dimension (date spine) — the ETL utility every
    gap-free report joins against; built from one sequence() row
    exploded, no source table. dayofweek trap pinned again: Spark
    1=Sunday/7=Saturday vs DuckDB 0=Sunday/6=Saturday."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("2024-01-01").cast("date"),
                    F.lit("2024-03-31").cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("day")
        )
        .select(
            "day",
            F.year("day").alias("y"),
            F.month("day").alias("m"),
            F.when(F.dayofweek("day").isin(1, 7), 1).otherwise(0).alias(
                "is_weekend"
            ),
        )
    )


@register(
    "scan_merge_schema",
    oracle="""
    SELECT event_id, user_id, round(value, 4) AS value,
           CASE WHEN event_id % 2 = 1 THEN event_type END AS event_type
    FROM events
    """,
    tier="P2",
)
def scan_merge_schema(spark, t):
    """Schema-evolution read: two generations of event files — the old
    layout without `event_type`, the new one with it — land in the same
    directory, and a ``mergeSchema`` scan reconciles them into one
    DataFrame (old rows get NULL for the new column). The ingest
    reality every long-lived pipeline hits when producers add fields.

    Spark resolves the merged schema from file footers at planning time
    — no data rewrite — and the per-file projections still prune
    columns; at 100 TB that matters more than it does here.
    """
    path = os.path.join(tracked_mkdtemp(prefix="mrg_"), "events_gens")
    e = t["events"].select(
        "event_id", "user_id", F.round("value", 4).alias("value"), "event_type"
    )
    old_gen = e.filter(F.col("event_id") % 2 == 0).drop("event_type")
    new_gen = e.filter(F.col("event_id") % 2 == 1)
    old_gen.write.mode("append").parquet(path)
    new_gen.write.mode("append").parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(path).select(
        "event_id", "user_id", "value", "event_type"
    )


@register(
    "scan_csv_malformed_permissive",
    oracle="""
    SELECT (SELECT COUNT(*) FROM nation)::BIGINT AS n_good,
           3::BIGINT AS n_corrupt
    """,
    tier="P2",
)
def scan_csv_malformed_permissive(spark, t):
    """Malformed-input ingest: a CSV containing every nation row plus 3
    injected junk lines (wrong arity / non-numeric key / raw garbage)
    is read in PERMISSIVE mode with a ``_corrupt_record`` column —
    valid rows parse, broken ones land in the quarantine column instead
    of failing the job. The report proves the split: good-row count
    equals the source table, corrupt count equals the injected lines.

    This is the ingest posture that matters at 100 TB: one bad line in
    a billion must quarantine, not kill the load (FAILFAST) or silently
    vanish (DROPMALFORMED).
    """
    path = os.path.join(tracked_mkdtemp(prefix="badcsv_"), "nation_dirty")
    t["nation"].select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).csv(path)
    with open(os.path.join(path, "zz_junk.csv"), "w") as f:
        f.write("1,TOO,MANY,FIELDS,HERE\n")
        f.write("not_a_number,BADKEY,7\n")
        f.write("garbage line without commas\n")
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()  # corrupt-record column requires a stable scan to count twice
    )
    return raw.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1))
        .cast("bigint")
        .alias("n_good"),
        F.count("_corrupt_record").cast("bigint").alias("n_corrupt"),
    )


@register(
    "sink_dynamic_partition_overwrite",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           COUNT(*) AS n_orders,
           round(SUM(CASE WHEN year(o_orderdate) = 1997
                          THEN o_totalprice * 0.9
                          ELSE o_totalprice END), 4) AS total
    FROM orders GROUP BY year(o_orderdate)
    """,
    tier="P2",
)
def sink_dynamic_partition_overwrite(spark, t):
    """Dynamic partition overwrite — the warehouse backfill primitive:
    rewrite ONLY the partitions present in the incoming frame (here a
    repriced 1997) while every other partition survives untouched. In
    static mode (Spark's default) the same overwrite DELETES all other
    partitions first — the classic footgun this operator demonstrates
    avoiding via the writer-level ``partitionOverwriteMode=dynamic``
    option (writer-scoped, so the session default stays static).

    The hash-check proves both halves of the contract at once: the
    read-back per-year totals match a SQL reconstruction where ONLY
    1997 is repriced — wrong mode would lose every other year (row
    counts collapse), a failed overwrite would leave 1997 unpriced.
    """
    path = os.path.join(tracked_mkdtemp(prefix="pq_dyn_"), "orders_by_year")
    base = t["orders"].withColumn("o_year", F.year("o_orderdate"))
    base.write.mode("overwrite").partitionBy("o_year").parquet(path)
    patch = (
        base.filter(F.col("o_year") == 1997)
        .withColumn("o_totalprice", F.col("o_totalprice") * 0.9)
    )
    (
        patch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_year")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy(F.col("o_year").cast("int").alias("o_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


@register(
    "scan_dynamic_partition_pruning",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           COUNT(*) AS n_orders,
           round(SUM(o_totalprice), 4) AS revenue
    FROM orders
    WHERE year(o_orderdate) IN (1997, 1998)
    GROUP BY 1 ORDER BY 1
    """,
    tier="P2",
)
def scan_dynamic_partition_pruning(spark, t):
    """Dynamic partition pruning (DPP): the fact table is partitioned on
    o_year, the filter lives on a DIMENSION (a year attribute table
    restricted to the focus years), and Spark must push the dim's
    surviving keys into the fact scan as a runtime partition filter —
    the mechanism that makes star-joins over partitioned 100 TB facts
    read only the partitions the dimension selects, without the query
    author naming them. tests/test_plans.py asserts ``dynamicpruning``
    appears in the fact scan's partition filters.

    The join is on the partition column and the dim side is broadcast —
    both DPP preconditions; the hash-check against a direct WHERE-IN
    proves the pruned plan returns exactly the unpruned answer.
    """
    path = os.path.join(tracked_mkdtemp(prefix="dpp_"), "orders_by_year")
    (
        t["orders"]
        .withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    dim = (
        t["orders"]
        .select(F.year("o_orderdate").alias("dim_year"))
        .distinct()
        .withColumn("is_focus", F.col("dim_year").isin(1997, 1998))
    )
    return (
        fact.join(
            F.broadcast(dim.filter("is_focus")),
            fact["o_year"] == F.col("dim_year"),
        )
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .orderBy("o_year")
    )


@register(
    "sink_sorted_clustered_write",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           COUNT(*) AS n_orders,
           round(SUM(o_totalprice), 4) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1 ORDER BY 1
    """,
    tier="P2",
)
def sink_sorted_clustered_write(spark, t):
    """Write orders range-partitioned AND sorted by date within each
    file, re-read with a date filter — the layout that makes parquet
    row-group min/max statistics actually prune: an unsorted write
    scatters every date across every row group (stats span everything,
    nothing prunes); repartitionByRange + sortWithinPartitions gives
    each file a tight date interval, so the pushed filter skips whole
    files and row groups. The hash check proves layout changes nothing
    semantically; the latency benefit is the layout's job.

    This is the batch sibling of ``sink_parquet_partitioned``
    (directory-level pruning) one level finer — at 100 TB you do BOTH:
    partition by the coarse key, sort by the fine one (a.k.a.
    clustering / Z-order's 1-D case).
    """
    path = os.path.join(tracked_mkdtemp(prefix="sorted_"), "orders_sorted")
    (
        t["orders"]
        .repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    return (
        back.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .orderBy("o_year")
    )


@register(
    "scan_text_roundtrip",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents GROUP BY source
    """,
    tier="P2",
)
def scan_text_roundtrip(spark, t):
    """Raw TEXT-LINES source roundtrip — ``spark.read.text`` is the
    ingest format every LLM corpus pipeline starts from (one document
    per line), and the one §2-A source the roundtrip suite hadn't
    covered: write `documents` as tab-delimited lines
    (``doc_id \\t source \\t text`` — the fixture corpus is verified
    tab/newline-free, so the framing is lossless), read the directory
    back as a single ``value`` column, and re-derive the typed columns
    with bounded ``split(..., limit=3)`` so document text containing
    spaces survives intact. The per-source aggregate of the RE-READ
    frame must hash-equal the oracle computed from the original table —
    proving line framing, shard split points, and the parse round-trip
    (line count = doc count ⇔ no line was split or merged).

    Scale posture: text is a splittable line-oriented format — the read
    parallelizes by file split exactly like the production JSONL/text
    corpora this stands in for; the write shards by the upstream
    partitioning. No schema inference anywhere (SURVEY §1.4): the text
    source has exactly one string column by construction, and the typed
    reparse is explicit casts.
    """
    path = os.path.join(tracked_mkdtemp(prefix="txt_rt_"), "docs_txt")
    t["documents"].select(
        F.concat_ws("\t", F.col("doc_id"), F.col("source"), F.col("text"))
        .alias("value")
    ).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t", 3)
    parsed = lines.select(
        parts.getItem(0).cast("bigint").alias("doc_id"),
        parts.getItem(1).alias("source"),
        parts.getItem(2).alias("text"),
    )
    return parsed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@register(
    "scan_jsonl_gzip_roundtrip",
    oracle="""
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents GROUP BY source, lang
    """,
    tier="P2",
)
def scan_jsonl_gzip_roundtrip(spark, t):
    """GZIP-COMPRESSED JSONL source roundtrip — ``*.jsonl.gz`` is THE
    interchange format real LLM corpora ship in (CommonCrawl dumps,
    RedPajama/Dolma shards), and the compressed-source case the
    roundtrip suite hadn't covered: write `documents` as
    gzip-compressed JSON lines (Spark's codec option on the JSON sink),
    read the directory back with an explicit schema (no inference,
    SURVEY §1.4), and hash a per-(source, lang) aggregate of the
    RE-READ frame against the original-table oracle — proving the
    compressed write, the decompressing read, and Jackson's bit-exact
    string/long round-trip end to end.

    Scale posture: gzip members are NOT splittable — each .json.gz file
    is one read task, so at 100 TB shard size IS the parallelism knob
    (the upstream partitioning here, one gz file per input partition;
    production corpora target 100-500 MB shards for exactly this
    reason). The aggregate itself is a plain partial-agg shuffle on the
    bounded (source, lang) key space. For splittable compressed scans
    the engine's parquet+zstd path (every other operator) is the
    recommendation; this op covers the interchange-ingest boundary.
    """
    path = os.path.join(tracked_mkdtemp(prefix="jsonl_gz_"), "docs_jsonl_gz")
    t["documents"].write.mode("overwrite").option("compression", "gzip").json(
        path
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum("n_chars").cast("bigint").alias("sum_n_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@register(
    "scan_csv_multiline_quoted",
    oracle="""
    SELECT doc_id,
           'v,"' || substr(text, 1, 24) || '"' || chr(10) || 'END'
             AS payload
    FROM documents
    """,
    tier="P2",
)
def scan_csv_multiline_quoted(spark, t):
    """CSV roundtrip through the three framing hazards at once: every
    payload cell contains a DELIMITER, an embedded DOUBLE QUOTE, and an
    embedded NEWLINE — the RFC-4180 corner the plain
    ``scan_csv_roundtrip`` never exercises and the #1 silent-corruption
    source when ingesting scraped/exported text as CSV.

    The payload is built deterministically from `documents`
    (``'v,"' + text[:24] + '"' + \\n + 'END'``) so the DuckDB oracle
    regenerates the expected strings without reading the temp files;
    the re-read rows are returned RAW — a hash match proves quoting,
    RFC doubled-quote escaping (``escape='"'``), and quoted-newline
    line reassembly all round-trip byte-exact, with no row split or
    merged (row count = doc count).

    Scale posture: ``multiLine=true`` makes each CSV file ONE read task
    (a quoted newline is indistinguishable from a record boundary
    without parsing from the file start), so shard size is the
    parallelism knob — exactly the gzip-JSONL lesson one operator up.
    Production guidance stays: land quoted-newline CSV once, convert to
    parquet, and never scan it twice.
    """
    path = os.path.join(tracked_mkdtemp(prefix="csv_ml_"), "docs_multiline")
    LAST_PATHS["scan_csv_multiline_quoted"] = path
    payload = F.concat(
        F.lit('v,"'), F.substring("text", 1, 24), F.lit('"\nEND')
    ).alias("payload")
    t["documents"].select("doc_id", payload).write.mode("overwrite").option(
        "header", "true"
    ).option("escape", '"').csv(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )


# ---------------------------------------------------------------------------
# Avro object container roundtrip. Spark's own `avro` data source is an
# EXTERNAL module (spark-avro_2.13) that is not on this distribution's
# classpath and cannot be fetched offline — but the format itself is a
# simple public spec (Avro 1.11 object container: magic Obj\x01, a
# metadata map carrying the JSON schema + codec, 16-byte sync markers,
# then [count, byte-size, payload, sync] blocks of binary-encoded
# records: zigzag-varint longs, length-prefixed UTF-8 strings). So the
# roundtrip is implemented against the spec directly: a distributed
# per-partition WRITER (mapInPandas -> one .avro container per
# partition) and an independent READER (binaryFile scan -> block walk,
# sync verification, record decode), the same
# encoder-and-decoder-as-separate-code-paths discipline as the PNG/GIF
# /JPEG codecs. On a cluster with spark-avro deployed, both stages
# collapse to `.write.format("avro")` / `.read.format("avro")` with
# the identical schema and partitioning.

_AVRO_SYNC = bytes.fromhex("737061726b2d67726166742d6176726f")  # 16 bytes
_AVRO_SCHEMA_JSON = (
    '{"type":"record","name":"doc","fields":['
    '{"name":"doc_id","type":"long"},'
    '{"name":"source","type":"string"},'
    '{"name":"lang","type":"string"},'
    '{"name":"text","type":"string"}]}'
)


def _avro_zigzag_varint(n: int) -> bytes:
    """Avro long: zigzag then base-128 little-endian varint."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_read_long(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one zigzag varint; returns (value, new_pos). Written
    independently of the encoder."""
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _avro_container(rows, schema_json: str) -> bytes:
    """One spec-valid object container holding ``rows`` (tuples in
    schema field order) as a single null-codec block."""
    payload = bytearray()
    n = 0
    for doc_id, source, lang, text in rows:
        payload += _avro_zigzag_varint(int(doc_id))
        for s in (source, lang, text):
            raw = s.encode("utf-8")
            payload += _avro_zigzag_varint(len(raw)) + raw
        n += 1
    meta_entries = [
        (b"avro.schema", schema_json.encode()),
        (b"avro.codec", b"null"),
    ]
    header = bytearray(b"Obj\x01")
    header += _avro_zigzag_varint(len(meta_entries))
    for k, v in meta_entries:
        header += _avro_zigzag_varint(len(k)) + k
        header += _avro_zigzag_varint(len(v)) + v
    header += _avro_zigzag_varint(0)  # end of metadata map
    header += _AVRO_SYNC
    block = (
        _avro_zigzag_varint(n)
        + _avro_zigzag_varint(len(payload))
        + bytes(payload)
        + _AVRO_SYNC
    )
    return bytes(header) + (block if n else b"")


def decode_avro_container(content: bytes):
    """Independent reader: verifies magic + codec, takes the field
    order from the embedded JSON schema (not from assumptions), walks
    every block verifying each 16-byte sync marker, and yields
    (doc_id, source, lang, text) tuples."""
    import json

    if content[:4] != b"Obj\x01":
        raise ValueError("not an Avro object container")
    pos = 4
    meta = {}
    while True:
        cnt, pos = _avro_read_long(content, pos)
        if cnt == 0:
            break
        if cnt < 0:  # negative count is followed by a byte size
            _sz, pos = _avro_read_long(content, pos)
            cnt = -cnt
        for _ in range(cnt):
            klen, pos = _avro_read_long(content, pos)
            key = content[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _avro_read_long(content, pos)
            meta[key] = content[pos : pos + vlen]
            pos += vlen
    if meta.get("avro.codec", b"null") != b"null":
        raise NotImplementedError("only the null codec is supported")
    schema = json.loads(meta["avro.schema"].decode())
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    sync = content[pos : pos + 16]
    pos += 16
    while pos < len(content):
        n_items, pos = _avro_read_long(content, pos)
        _size, pos = _avro_read_long(content, pos)
        for _ in range(n_items):
            rec = {}
            for fname, ftype in fields:
                if ftype == "long":
                    rec[fname], pos = _avro_read_long(content, pos)
                elif ftype == "string":
                    slen, pos = _avro_read_long(content, pos)
                    rec[fname] = content[pos : pos + slen].decode("utf-8")
                    pos += slen
                else:
                    raise NotImplementedError(f"avro type {ftype}")
            yield tuple(rec[f["name"]] for f in schema["fields"])
        if content[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch — container corrupt")
        pos += 16


@register(
    "scan_avro_roundtrip",
    oracle="""
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents GROUP BY source, lang
    """,
    tier="P2",
)
def scan_avro_roundtrip(spark, t):
    """Avro interchange roundtrip WITHOUT the spark-avro module (see
    the section comment above): `documents` is written as one
    spec-valid Avro object container per partition by a distributed
    ``mapInPandas`` stage, re-read through a ``binaryFile`` scan whose
    ``mapInPandas`` stage runs the independent spec decoder, and the
    per-(source, lang) aggregate of the RE-READ rows must hash-equal
    the oracle computed from the original table — proving the zigzag
    varint codec, UTF-8 string framing, block structure and sync
    markers all round-trip byte-exact.

    The write is materialized by collecting the one-row-per-partition
    manifest (bounded: == 8 rows by the explicit repartition).
    Executors write a driver-local temp dir — the same single-node
    convenience every non-parquet roundtrip in this suite documents.

    Scale posture: Avro containers are block-splittable on the sync
    marker in real readers; one-container-per-partition keeps the
    write embarrassingly parallel, and the binaryFile re-read
    parallelizes per file. With spark-avro on the classpath both
    stages become the built-in data source with the same layout.
    """
    import glob as _glob

    path = tracked_mkdtemp(prefix="avro_rt_")
    LAST_PATHS["scan_avro_roundtrip"] = path
    docs = t["documents"].select("doc_id", "source", "lang", "text")

    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in batches:
            rows.extend(
                zip(pdf["doc_id"], pdf["source"], pdf["lang"], pdf["text"])
            )
        fn = os.path.join(path, f"part-{pid:05d}.avro")
        with open(fn, "wb") as fh:
            fh.write(_avro_container(rows, _AVRO_SCHEMA_JSON))
        yield pd.DataFrame({"file": [fn], "n": [len(rows)]})

    manifest = (
        docs.repartition(8)
        .mapInPandas(write_part, schema="file string, n long")
        .collect()  # bounded: exactly 8 manifest rows (one per partition)
    )
    assert len(manifest) == 8

    raw = spark.read.format("binaryFile").load(f"{path}/*.avro")

    def read_part(batches):
        for pdf in batches:
            out = {"doc_id": [], "source": [], "lang": [], "text": []}
            for content in pdf["content"]:
                for doc_id, source, lang, text in decode_avro_container(
                    content
                ):
                    out["doc_id"].append(doc_id)
                    out["source"].append(source)
                    out["lang"].append(lang)
                    out["text"].append(text)
            yield pd.DataFrame(out)

    parsed = raw.select("content").mapInPandas(
        read_part,
        schema="doc_id long, source string, lang string, text string",
    )
    return parsed.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@register(
    "scan_fixed_width_roundtrip",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer",
    tier="P2",
)
def scan_fixed_width_roundtrip(spark, t):
    """FIXED-WIDTH text interchange roundtrip — the mainframe/COBOL
    copybook format that still feeds bank and telco ETL: `customer`
    serializes to 49-char records (custkey 12, name 25 space-padded,
    nationkey 4, acctbal as offset-encoded integer cents in 8 digits —
    the sign-free encoding fixed-width feeds use), written via the text
    sink; the reader is the independent path — substring slicing at
    the copybook offsets + casts, entirely codegen projections over a
    plain text scan (no UDF, splittable, scales like any line format).

    The source table is the oracle, which makes the hash-check a
    LOSSLESSNESS proof: cents = round(acctbal*100) is exact for the
    2-decimal domain, and cents/100.0 re-rounds to the identical IEEE
    double, so every reconstructed column equals the source bit-for-bit
    (names carry no trailing spaces, so rtrim inverts the pad).
    """
    path = os.path.join(tracked_mkdtemp(prefix="fw_rt_"), "customer_fw")
    line = F.concat(
        F.lpad(F.col("c_custkey").cast("string"), 12, "0"),
        F.rpad(F.col("c_name"), 25, " "),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0"),
        F.lpad(
            (F.round(F.col("c_acctbal") * 100).cast("bigint")
             + F.lit(10_000_000)).cast("string"),
            8,
            "0",
        ),
    )
    t["customer"].select(line.alias("value")).write.mode(
        "overwrite"
    ).text(path)
    raw = spark.read.text(path)
    return raw.select(
        F.substring("value", 1, 12).cast("bigint").alias("c_custkey"),
        F.rtrim(F.substring("value", 13, 25)).alias("c_name"),
        F.substring("value", 38, 4).cast("int").alias("c_nationkey"),
        (
            (F.substring("value", 42, 8).cast("bigint") - F.lit(10_000_000))
            / 100.0
        ).alias("c_acctbal"),
    )
