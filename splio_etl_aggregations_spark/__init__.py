"""splio_etl_aggregations_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
``DataSentics/splio-etl-aggregations`` (reference snapshot at
``/root/reference`` — its only content is the title line,
``/root/reference/README.md:1``; the capability contract is reconstructed
in ``SURVEY.md``), expressed Spark-first: declarative DataFrame/SQL plans
optimized by Catalyst, Arrow-vectorized Python only where built-in
operators can't express the semantics (vector similarity, stateful ops).

Layout
------
- ``session``    : SparkSession construction / configuration of an existing one
- ``sources``    : schema-asserted fixture loader (incl. the ns-timestamp fix),
                   CSV/JSON/partitioned-sink roundtrips, binary ingest
- ``registry``   : the operator registry backing ``__spark_entry__.queries()``
- ``operators``  : relational operators (scans/filters/joins/aggs/windows/
                   sorts/setops), text/dedup/vector operators
- ``functions``  : scalar function-family queries + determinism helpers
- ``streaming``  : Structured Streaming operators + batch-equivalent forms
- ``plans``      : physical-plan inspection helpers (pushdown/broadcast checks)
"""

from __future__ import annotations

__version__ = "0.1.0"

_REGISTERED = False


def register_all() -> None:
    """Import every operator module so its ``@register`` decorators run."""
    global _REGISTERED
    if _REGISTERED:
        return
    from .operators import (  # noqa: F401
        aggs,
        corpus,
        dedup,
        etl,
        features,
        filters,
        joins,
        lake,
        mlprep,
        multimodal,
        sampling,
        scans,
        setops,
        sorts,
        sqlshapes,
        sqlsuite,
        text,
        timeseries,
        udx,
        vectors,
        windows,
    )
    from .functions import scalars  # noqa: F401
    from .streaming import ops as streaming_ops  # noqa: F401

    _REGISTERED = True
