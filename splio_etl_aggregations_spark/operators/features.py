"""Feature-preparation operators — the last mile before training.

Normalization at 100 TB is a two-pass problem: a small statistics
aggregate (one row per stratum) and a full-table projection that applies
it. The join between them must broadcast — the stats side is bounded by
the stratum cardinality, never by the data — so the apply pass stays a
map-side, codegen-friendly single scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.helpers import r4
from ..registry import register


@register(
    "ml_standardize_features",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 4) AS z_value
    FROM events e JOIN stats s USING (event_type)
    """,
    tier="P2",
)
def ml_standardize_features(spark, t):
    """Per-stratum z-score standardization of the value column: the
    fit/transform split of a feature scaler expressed as one plan.

    The 'fit' is a |event_type|-row aggregate; the 'transform' joins it
    back with an explicit broadcast, so the full-table side never
    shuffles — at 100 TB this is one scan plus a map-side hash join.
    Welford-based stddev_samp agrees between engines to well inside the
    4-dp rounding.
    """
    e = t["events"]
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            r4((F.col("value") - F.col("mu")) / F.col("sigma")).alias("z_value"),
        )
    )
