"""Determinism helpers (SURVEY.md §5.4).

Hash-matching a DuckDB oracle across engines survives only if both sides
agree on float rounding, tie-breaks, and collection ordering. These
helpers encode the policy once:

- ``r4``/``r6``: round derived double aggregates (4 dp) and similarity
  scores (6 dp) — applied on BOTH engine and oracle sides.
- ``sorted_list``: ``collect_list`` is only ever emitted sorted.
- every ``ORDER BY`` feeding a limit / row_number ends in a unique key —
  that lives at call sites, but ``topk`` documents and enforces it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def r4(c: ColumnOrName) -> Column:
    """Round a derived double aggregate to 4 dp (oracle does the same)."""
    return F.round(_col(c), 4)


def r6(c: ColumnOrName) -> Column:
    """Round a similarity / distance score to 6 dp."""
    return F.round(_col(c), 6)


def net_price() -> Column:
    """The TPC-H style discounted line price, used by several queries."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def sorted_list(c: ColumnOrName) -> Column:
    """Deterministic per-group list: collect_list order is nondeterministic
    under parallel aggregation, so always sort."""
    return F.sort_array(F.collect_list(_col(c)))


def topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k with an explicit (caller-supplied) total order.

    The caller's ``order`` MUST end in a unique key; Spark compiles
    sort+limit to TakeOrderedAndProject (no full sort / single-node
    shuffle), which is the scale-correct top-k plan.
    """
    return df.orderBy(*order).limit(k)
