"""Cross-engine deterministic hashing (sketch-operator foundation).

Spark's fast hashes (xxhash64, murmur) have no DuckDB equivalent, which
is why round-1's sketch operators (HLL, count-min, simhash) could not be
oracle-checked. md5 IS implemented identically everywhere, so every
sketch here hashes through it:

    ph60(x, seed)  =  int(md5(f"{seed}:{x}")[:15 hex chars])  ∈ [0, 2^60)

- Spark:  ``conv(substr(md5(concat('{seed}:', x)), 1, 15), 16, 10)``
- DuckDB: ``('0x' || substr(md5('{seed}:' || x), 1, 15))::ubigint``

both verified bit-identical (tests/test_units.py). 15 hex chars = 60
bits keeps every downstream integer (register sums, band buckets,
simhash fingerprints) inside a signed 64-bit lane on both engines — no
overflow, no sign traps, ANSI-mode safe.

md5 costs ~3× xxhash64 per call; at 100 TB you would flip these helpers
to xxhash64 and drop the cross-engine oracle (the algorithms above them
are hash-agnostic). The sketch *logic* — register max, counter min,
sign-sum — is what the oracles prove.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .helpers import ColumnOrName, _col

#: one more than the widest rank ph60-based HLL can emit (54-bit tail)
HLL_RANK_ZERO = 55


def ph60(c: ColumnOrName, seed: int | str) -> Column:
    """Portable 60-bit hash of a (string-castable) column, seeded."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), _col(c).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def ph60_sql(expr: str, seed: int | str) -> str:
    """DuckDB fragment computing the same 60-bit hash of ``expr``.
    The final ``::bigint`` is lossless (60 bits < 63) and REQUIRED:
    UBIGINT output columns reach the correctness driver through the
    same arrow-extension render path as HUGEINT, the round-3 red-row
    class — Spark's ph60 is a signed LongType, so both engines must
    emit the signed family."""
    return (
        f"('0x' || substr(md5('{seed}:' || ({expr})), 1, 15))"
        "::ubigint::bigint"
    )


def hll_rank(w: ColumnOrName, width: int = 54) -> Column:
    """1-based position of the first set bit of ``w`` seen as a
    ``width``-bit string (``width + 1`` when w = 0) — the HLL register
    rank, in exact integer/string ops (no float log2, whose libm
    rounding differs across engines at 2^k boundaries)."""
    w = _col(w)
    return F.when(w == 0, F.lit(width + 1)).otherwise(
        F.instr(F.lpad(F.bin(w), width, "0"), "1")
    )


def hll_rank_sql(expr: str, width: int = 54) -> str:
    """DuckDB fragment for :func:`hll_rank`."""
    return (
        f"CASE WHEN ({expr}) = 0 THEN {width + 1} "
        f"ELSE strpos(lpad(bin({expr}), {width}, '0'), '1') END"
    )
