"""Differential comparison utilities — mirrors the driver's t2 check:
row count + column names + order-insensitive value multiset, with columns
sorted by name (so column order never matters, names always do)."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

from pyspark.sql import DataFrame


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        # The driver's canonicalizer renders Decimal (DuckDB
        # HUGEINT/DECIMAL) differently than int64/float64 even when the
        # values are equal — collapsing here made the preflight LAXER
        # than the driver, which is how 49 HUGEINT oracles survived two
        # "ALL MATCH" sweeps and then turned the round-3 driver rows red
        # (VERDICT r3 §What's wrong #1). Reject instead; oracles must
        # CAST to BIGINT/DOUBLE at the source.
        raise TypeError(
            "driver-unsafe Decimal result cell; CAST the oracle column "
            f"to BIGINT or DOUBLE (got {v!r})"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple, dict)):
        # The driver's canonicalizer (pandas sort_values over all columns)
        # crashes on array/map cells — round 1 lost agg_collect and
        # agg_approx_percentile to exactly this. Reject here so the
        # internal preflight is at least as strict as the driver.
        raise TypeError(
            "driver-unsafe result cell (array/map); declare scalar columns "
            f"instead (got {type(v).__name__}: {v!r})"
        )
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    return v


def assert_driver_safe_schema(df: DataFrame, name: str = "") -> None:
    """Every declared query output must be flat scalars: the driver's
    canonicalizer cannot sort array/map/struct cells (round-1 lesson)."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"[{name}] driver-unsafe non-scalar output columns: {bad}"


def spark_rows(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_value(r[c]) for c in cols) for r in df.collect()
    ]
    return cols, rows


def duck_rows(con, sql: str) -> tuple[list[str], list[tuple]]:
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(_norm_value(r[i]) for i in order) for r in res.fetchall()]
    return cols, rows


def diff_report(
    name: str,
    s_cols: list[str],
    s_rows: list[tuple],
    d_cols: list[str],
    d_rows: list[tuple],
    max_examples: int = 5,
) -> str | None:
    """None if equal; otherwise a human-readable mismatch report."""
    problems: list[str] = []
    if s_cols != d_cols:
        problems.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not problems:
        from collections import Counter

        cs, cd = Counter(s_rows), Counter(d_rows)
        if cs != cd:
            only_s = list((cs - cd).elements())[:max_examples]
            only_d = list((cd - cs).elements())[:max_examples]
            problems.append(
                f"value mismatch: {sum((cs - cd).values())} rows only in spark, "
                f"{sum((cd - cs).values())} only in duckdb\n"
                f"  spark-only (sample): {only_s}\n  duckdb-only (sample): {only_d}"
            )
    if not problems:
        return None
    return f"[{name}] " + "; ".join(problems)
