"""SparkSession construction and tuning.

Two entry paths:

- ``get_spark()`` builds a session for tests / bench (local mode).
- ``configure(spark)`` applies the *runtime-settable* subset of the same
  configuration to a session we did not build (the driver passes its own
  session to ``__spark_entry__.entry``). Verified on Spark 4.1.2 that
  ``spark.sql.legacy.parquet.nanosAsLong`` and the session timezone are
  settable at runtime, which is what makes the events table readable
  regardless of who constructed the session (SURVEY.md §1.3).

Scale posture (SURVEY.md §4.2): AQE on (runtime re-planning, skew-join
splitting, partition coalescing), broadcast threshold left at default
10 MB so every dim table in the star schema broadcasts, shuffle
partitions sized for the local harness but overridable via env for a
real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Settings that are safe (and verified) to apply to a live session.
RUNTIME_CONF: dict[str, str] = {
    # events.parquet carries TIMESTAMP(NANOS); Spark must read it as long
    # (loader converts to a microsecond timestamp — FIXTURES.md "Load recipes").
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic date/time semantics vs the DuckDB oracle (naive timestamps).
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: partition coalescing + skew-join handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Coalesce by partition SIZE, not default parallelism: without this AQE
    # refuses to merge the tiny post-shuffle partitions a small stage
    # produces (and on a busy large cluster the docs recommend false too).
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every Python boundary (pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def default_shuffle_partitions() -> int:
    return int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine configuration to an existing session."""
    conf = dict(RUNTIME_CONF)
    # A session we didn't build (the driver's) keeps Spark's default 200
    # shuffle partitions — far too many tasks at test scale. AQE coalesces
    # downward, so the env-tunable default is a ceiling, not a floor.
    conf["spark.sql.shuffle.partitions"] = str(default_shuffle_partitions())
    for key, value in conf.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A config may be marked static in a future Spark; the builder
            # path sets it at construction time, so best-effort is correct here.
            pass
    return spark


def get_spark(
    app_name: str = "splio-etl-aggregations-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a configured SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or default_shuffle_partitions()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return configure(spark)
