#!/usr/bin/env python
"""Phase-level profile of dedup_near_minhash at a given SF (guide §1:
measure first). Times, in one fresh session:

  1. builder() call alone (py4j frame construction, includes the
     eager localCheckpoint/count actions the builder runs)
  2. first noop-sink execution of the built frame
  3. second noop execution of the SAME frame (warm, plans compiled)
  4. a REBUILT frame's noop execution (codegen-cache probe)

plus the same for isolated sub-phases (signature fold, gram masks).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from splio_etl_aggregations_spark import register_all  # noqa: E402
from splio_etl_aggregations_spark.registry import all_queries  # noqa: E402
from splio_etl_aggregations_spark.session import get_spark  # noqa: E402
from splio_etl_aggregations_spark.sources.loader import load  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAME = sys.argv[1] if len(sys.argv) > 1 else "dedup_near_minhash"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    register_all()
    spark = get_spark(app_name="profile-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load(spark, SF)
    q = all_queries()[NAME]

    t0 = time.perf_counter()
    df = q.builder(spark, tables)
    t1 = time.perf_counter()
    print(f"build_1        {t1 - t0:7.3f}s")
    noop(df)
    t2 = time.perf_counter()
    print(f"exec_1 (noop)  {t2 - t1:7.3f}s")
    noop(df)
    t3 = time.perf_counter()
    print(f"exec_2 (noop)  {t3 - t2:7.3f}s")

    t4 = time.perf_counter()
    df2 = q.builder(spark, tables)
    t5 = time.perf_counter()
    print(f"build_2        {t5 - t4:7.3f}s")
    noop(df2)
    t6 = time.perf_counter()
    print(f"exec_3 (noop, rebuilt frame) {t6 - t5:7.3f}s")

    # JVM codegen metrics (cumulative): compile time + generated sizes
    jvm = spark.sparkContext._jvm
    cm = jvm.org.apache.spark.metrics.source.CodegenMetrics
    print(
        "codegen: compilationTime(ms hist count/mean) =",
        cm.METRIC_COMPILATION_TIME().getSnapshot().size(),
        cm.METRIC_COMPILATION_TIME().getSnapshot().getMean(),
        " generatedMethodSize mean =",
        cm.METRIC_GENERATED_METHOD_BYTECODE_SIZE().getSnapshot().getMean(),
    )


if __name__ == "__main__":
    main()
