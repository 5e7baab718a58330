"""Physical-plan inspection helpers (SURVEY.md §5.3-5).

The engine adds no Catalyst rules (§4.1) — instead it *asserts* the
optimizer produced the plan we rely on at scale: filters pushed into the
parquet scan, dims broadcast, sort+limit fused to TakeOrderedAndProject,
whole-stage codegen covering the hot pipelines. These helpers back
tests/test_plans.py and ad-hoc `.explain` review during development.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def has_operator(df: DataFrame, name: str) -> bool:
    """True if the physical plan contains an operator (e.g.
    'BroadcastHashJoin', 'TakeOrderedAndProject', 'WholeStageCodegen')."""
    return name in explain_str(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists on every file scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out
