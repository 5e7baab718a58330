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


def _spark_type_family(dtype) -> str:
    from pyspark.sql import types as T

    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dtype, T.DecimalType):
        return "decimal"  # banned — assert_driver_safe_schema rejects it
    if isinstance(dtype, T.StringType):
        return "str"
    if isinstance(dtype, T.BooleanType):
        return "bool"
    if isinstance(dtype, T.DateType):
        return "date"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dtype, T.BinaryType):
        return "bin"
    return f"other:{dtype.simpleString()}"


def _duck_type_family(typ: str) -> str:
    t = typ.upper()
    if "HUGEINT" in t or "DECIMAL" in t:
        return "decimal"  # banned — the r3 canonicalizer class
    if t.startswith("U") and "INT" in t:
        return "decimal"  # unsigned: same arrow-extension render risk
    if "INT" in t:
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE") or t.startswith("FLOAT"):
        return "float"
    if "VARCHAR" in t or t in ("TEXT", "STRING"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "BLOB":
        return "bin"
    return f"other:{t}"


def type_family_report(name, df: DataFrame, con, sql: str) -> str | None:
    """Cross-engine TYPE-FAMILY agreement per output column. Equal
    values are not enough for the driver: its canonicalizer renders the
    cell's type — a Spark BIGINT 5 against a DuckDB DOUBLE 5.0 hashes
    differently even though Python's == (and therefore this module's
    Counter compare) treats them as equal, exactly the laxity that let
    49 HUGEINT oracles through two full sweeps (VERDICT r3). This check
    closes the remaining gap: every column must agree on
    int/float/str/bool/date/ts/bin family across engines.
    """
    s_fam = {f.name: _spark_type_family(f.dataType) for f in df.schema.fields}
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    d_fam = {col: _duck_type_family(typ) for col, typ, *_ in desc}
    if set(s_fam) != set(d_fam):
        return f"[{name}] column names differ: spark={sorted(s_fam)} duckdb={sorted(d_fam)}"
    bad = {
        c: (s_fam[c], d_fam[c])
        for c in sorted(s_fam)
        if s_fam[c] != d_fam[c]
    }
    if bad:
        return (
            f"[{name}] type-family skew (spark, duckdb): {bad} — CAST one "
            "side so both engines emit the same value family"
        )
    return None


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
