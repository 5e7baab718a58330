"""Operator registry — the spine of the engine's public surface.

Every operator from SURVEY.md §2 registers itself here with:

- a builder ``fn(spark, tables) -> DataFrame`` (``tables`` is the dict the
  fixtures loader returns; temp views are registered too, so builders may
  use ``spark.sql``),
- an optional DuckDB oracle SQL string (None ⇒ the driver runs the weaker
  rows-only check, per ``__spark_entry__.py:35-36``),
- a tier tag (P0 flagship path … P3 advanced) for build-order bookkeeping.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin projections of
this registry, which keeps the driver contract file trivial and makes the
engine's own test suite (differential preflight) iterate the exact same
set the driver will.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, dict[str, DataFrame]], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    tier: str
    doc: str

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        from .sources.loader import load

        return self.builder(spark, load(spark, sf_dir))

    def runner(self) -> Callable[[SparkSession, str], DataFrame]:
        return lambda spark, sf_dir: self.run(spark, sf_dir)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tier: str = "P1"):
    """Decorator: register a query builder under a SURVEY.md §2 ID."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        REGISTRY[name] = Query(
            name=name,
            builder=fn,
            oracle=oracle.strip() if oracle else None,
            tier=tier,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def get(name: str) -> Query:
    from . import register_all

    register_all()
    return REGISTRY[name]


def all_queries() -> dict[str, Query]:
    from . import register_all

    register_all()
    return dict(REGISTRY)
