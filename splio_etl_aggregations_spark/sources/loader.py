"""Schema-asserted fixture loader (SURVEY.md §1, FIXTURES.md).

One central place that:

1. applies the runtime configuration (ns-as-long parquet read, UTC tz),
2. reads the ten fixture tables,
3. normalizes ``events.ts`` to a microsecond ``timestamp`` whatever the
   parquet physical type is — the driver has shipped both TIMESTAMP(NANOS)
   (read as a long via ``nanosAsLong``; ``ts div 1000`` is *integer*
   division so the conversion is exact) and plain TIMESTAMP(MICROS)
   (read as ``timestamp_ntz``; cast under the UTC session zone, which
   preserves the naive value bit-for-bit),
4. asserts the post-load schema against the declared one so fixture
   drift fails loudly instead of producing wrong hashes,
5. registers every table as a temp view so operators can use
   ``spark.sql`` as well as the DataFrame API.

The loads are lazy (parquet footer reads only) and memoized per
``(session, sf_dir)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Declared post-load schemas: (column, spark simpleString type) pairs.
# Measured from the parquet footers (FIXTURES.md "Schemas").
EXPECTED_SCHEMAS: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}

_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


class SchemaDriftError(RuntimeError):
    pass


def _assert_schema(name: str, df: DataFrame) -> None:
    actual = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    expected = EXPECTED_SCHEMAS[name]
    if actual != expected:
        raise SchemaDriftError(
            f"fixture table {name!r}: schema drift\n"
            f"  expected: {expected}\n  actual:   {actual}"
        )


def load(
    spark: SparkSession, sf_dir: str, *, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load all fixture tables from ``sf_dir`` as a name → DataFrame dict."""
    sf_dir = sf_dir.rstrip("/")
    # applicationId is unique per session lifetime — unlike id(spark),
    # which CPython recycles after GC, so a new session at a reused
    # address could receive DataFrames bound to a stopped session.
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CACHE.get(key)
    if cached is not None:
        if register_views:
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
        return cached

    configure(spark)
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            ts_type = dict(df.dtypes)["ts"]
            if ts_type == "bigint":
                # ts arrives as a nanosecond bigint (nanosAsLong=true); the
                # data has zero sub-microsecond components (FIXTURES.md), so
                # integer `div 1000` + timestamp_micros reproduces DuckDB's
                # value exactly.
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            else:
                # TIMESTAMP(MICROS) parquet reads as timestamp_ntz; casting
                # under the UTC session zone keeps the naive value exact.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
        _assert_schema(name, df)
        tables[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    _CACHE[key] = tables
    return tables
