"""Driver contract for the spark-graft builder (PySpark target).

Thin projection of the engine's operator registry
(``splio_etl_aggregations_spark.registry``): every SURVEY.md §2 operator
registers a DataFrame builder + (where SQL-expressible) a DuckDB oracle,
and this file just exposes them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from splio_etl_aggregations_spark import register_all
from splio_etl_aggregations_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (customer-360 RFM rollup) on /root/testdata/sf0.001."""
    register_all()
    from splio_etl_aggregations_spark.registry import get

    return get("rfm_customer_360").run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.runner() for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checked query (rows-only
    operators — sketches, LSH, stream-only behaviors — are omitted)."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
