"""Property-based algebraic invariants (SURVEY.md §5.3-3, hypothesis).

Frames are generated per-example but executed through the same Spark
session; sizes stay tiny so each example is a sub-second local job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

row = st.tuples(
    st.integers(min_value=0, max_value=5),  # key
    st.integers(min_value=-100, max_value=100),  # value
)
frames = st.lists(row, min_size=0, max_size=30)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0)], "k int, v int").limit(
        len(rows)
    )


@SLOW
@given(rows=frames)
def test_group_sums_partition_total(spark, rows):
    df = _df(spark, rows)
    total = df.agg(F.sum("v")).collect()[0][0]
    by_group = df.groupBy("k").agg(F.sum("v").alias("s")).agg(F.sum("s")).collect()[0][0]
    assert total == by_group


@SLOW
@given(rows=frames, rows2=frames)
def test_left_join_never_loses_left_rows(spark, rows, rows2):
    left, right = _df(spark, rows), _df(spark, rows2)
    right_keys = right.select("k").distinct()
    joined = left.join(right_keys, "k", "left")
    assert joined.count() == left.count()


@SLOW
@given(rows=frames, rows2=frames)
def test_semi_anti_partition_left(spark, rows, rows2):
    left, right = _df(spark, rows), _df(spark, rows2)
    semi = left.join(right, "k", "left_semi").count()
    anti = left.join(right, "k", "left_anti").count()
    assert semi + anti == left.count()


@SLOW
@given(rows=frames, rows2=frames)
def test_union_all_is_additive(spark, rows, rows2):
    a, b = _df(spark, rows), _df(spark, rows2)
    assert a.unionByName(b).count() == a.count() + b.count()


@SLOW
@given(rows=frames, rows2=frames)
def test_setop_cardinality_identity(spark, rows, rows2):
    """|A ∪ B| = |A| + |B| − |A ∩ B| on distinct projections."""
    a, b = _df(spark, rows).distinct(), _df(spark, rows2).distinct()
    union = a.unionByName(b).distinct().count()
    inter = a.intersect(b).count()
    assert union == a.count() + b.count() - inter


@SLOW
@given(rows=frames)
def test_window_preserves_row_count(spark, rows):
    from pyspark.sql import Window

    df = _df(spark, rows)
    w = Window.partitionBy("k").orderBy("v")
    assert df.select(F.row_number().over(w)).count() == df.count()


@SLOW
@given(rows=frames)
def test_distinct_idempotent(spark, rows):
    df = _df(spark, rows).distinct()
    assert df.count() == df.distinct().count()


@SLOW
@given(rows=frames)
def test_exceptall_roundtrip(spark, rows):
    """(A ∪ A) \\ A = A as bags."""
    a = _df(spark, rows)
    doubled = a.unionByName(a)
    back = doubled.exceptAll(a)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, a.collect()))
