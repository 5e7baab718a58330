#!/usr/bin/env python
"""Per-shape phase profile (guide §1): for each named query print
  build  — builder() wall (py4j construction + any build-time actions)
  exec1  — first noop-sink run of that frame (codegen compile + run)
  exec2  — second noop run of the SAME frame (pure execution)
  re-run — builder()+noop again (what bench's warm runs actually pay)
Usage: tools/profile_shapes.py <shape> [...]   (SF via SPARK_GRAFT_SF_DIR)
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


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    register_all()
    spark = get_spark(app_name="profile-shapes")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load(spark, SF)
    qs = all_queries()
    for name in sys.argv[1:]:
        q = qs[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = q.builder(spark, tables)
        t1 = time.perf_counter()
        noop(df)
        t2 = time.perf_counter()
        noop(df)
        t3 = time.perf_counter()
        df2 = q.builder(spark, tables)
        noop(df2)
        t4 = time.perf_counter()
        print(
            f"{name:42s} build={t1-t0:6.2f} exec1={t2-t1:6.2f} "
            f"exec2={t3-t2:6.2f} rerun={t4-t3:6.2f}",
            flush=True,
        )
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
