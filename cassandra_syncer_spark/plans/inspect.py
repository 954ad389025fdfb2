"""Helpers for asserting physical-plan properties.

At 100 TB the difference between a broadcast join and an accidental
sort-merge (or worse, a cartesian) is the difference between minutes and
days; these helpers make those properties testable so they can't silently
regress (see tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the parquet reader."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in executed_plan(df)
