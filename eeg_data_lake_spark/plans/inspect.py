"""Assertable physical-plan properties.

At 100 TB the difference between a good and a bad plan is the job:
a scan that reads all columns, a join that falls back to a nested
loop, or an extra exchange each multiply cost by data volume. These
helpers parse `.explain("formatted")` output so tests can pin the
plan *shape* — pushdown reached the scan, the small side broadcast,
the shuffle count is what the operator design promised — and any
regression (a Spark upgrade, a refactor reordering expressions)
fails CI instead of shipping a 100× slower plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The text `df.explain(mode)` would print, as a value."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — those move only the small side)."""
    plan = explain_string(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning", plan)) + len(
        re.findall(r"^\s*\(\d+\)\s+Exchange\s*$", plan, re.M)
    )


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (e.g. BroadcastHashJoin,
    SortMergeJoin, ShuffledHashJoin, BroadcastNestedLoopJoin)."""
    plan = explain_string(df)
    return re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )


def has_cartesian_or_bnlj(df: DataFrame) -> bool:
    return any(
        s in ("BroadcastNestedLoopJoin", "CartesianProduct")
        for s in join_strategies(df)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the data source (parquet row-group / page
    skipping), from the scan node's PushedFilters attribute."""
    plan = explain_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each file scan (column pruning
    evidence): parsed from ReadSchema struct signatures."""
    plan = explain_string(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            c.split(":")[0].strip()
            for c in m.group(1).split(",")
            if ":" in c
        ]
        scans.append(cols)
    return scans
