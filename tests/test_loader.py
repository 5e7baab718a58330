"""Loader robustness probes: the failure modes a driver session can hit
(bad paths, repeated loads, switching scale factors mid-session) must be
clean and cheap, not silent or stateful-wrong."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import AnalysisException

from splio_etl_aggregations_spark.sources.loader import TABLE_NAMES, load

from .conftest import SF_SMALL, SF_T2


def test_bad_sf_dir_raises_cleanly(spark):
    with pytest.raises(AnalysisException):
        load(spark, "/root/testdata/sf_does_not_exist")["orders"].count()


def test_repeat_load_is_memoized(spark):
    a = load(spark, SF_SMALL)
    b = load(spark, SF_SMALL)
    assert all(a[n] is b[n] for n in TABLE_NAMES)


def test_alternating_sf_dirs_reregister_views(spark):
    """Switching scale factors in one session must re-point the temp views
    — a stale view would silently hash the wrong scale's data."""
    load(spark, SF_SMALL)
    n_small = spark.table("orders").count()
    load(spark, SF_T2)
    n_t2 = spark.table("orders").count()
    load(spark, SF_SMALL)
    n_small_again = spark.table("orders").count()
    assert n_small == 1_500 and n_t2 == 15_000 and n_small_again == 1_500


def test_events_ts_is_microsecond_timestamp(spark):
    t = load(spark, SF_SMALL)
    field = dict(t["events"].dtypes)["ts"]
    assert field == "timestamp"
    # zero rows may carry sub-µs components (they'd be lost): the fixture
    # has none, which is what makes the ns→µs conversion oracle-exact
    assert t["events"].count() == 1_000


def test_all_tables_registered_as_views(spark):
    load(spark, SF_SMALL)
    for name in TABLE_NAMES:
        assert spark.table(name).count() > 0
