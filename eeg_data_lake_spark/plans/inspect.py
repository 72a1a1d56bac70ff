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


def explain_cost(df: DataFrame) -> dict:
    """One-glance scale report for a plan — the checklist a reviewer
    walks before shipping a query to a 1000-executor cluster, as data:

    ``exchanges`` (each multiplies cost by data volume), ``joins`` and
    ``has_nested_loop`` (a BNLJ/cartesian on big inputs is the classic
    100× regression), ``pushed_filters`` / ``scan_columns`` (did
    pruning reach parquet), ``python_stages`` (Arrow/row-at-a-time
    Python evals — the slow path when a builtin would do), and
    ``codegen_spans`` (how much of the plan fused into whole-stage
    codegen). Pair with `.explain("formatted")` when a number looks
    wrong; pin the shape in tests via the individual helpers."""
    import re as _re

    plan = explain_string(df)
    return {
        "exchanges": count_exchanges(df),
        "joins": join_strategies(df),
        "has_nested_loop": has_cartesian_or_bnlj(df),
        "pushed_filters": pushed_filters(df),
        "scan_columns": read_schema_columns(df),
        "python_stages": len(
            _re.findall(r"\b(ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|"
                        r"MapInPandas|FlatMapGroupsInArrow|PythonMapInArrow)\b", plan)
        ),
        # codegen fusion markers (*(n), simple mode) exist only in the
        # FINAL plan: under AQE that means after an action has run on
        # this DataFrame. None = unknown yet (re-call after executing).
        "codegen_spans": (
            len(spans)
            if (spans := set(_re.findall(r"\*\((\d+)\)", explain_string(df, "simple"))))
            or "isFinalPlan=false" not in explain_string(df, "simple")
            else None
        ),
    }


def print_cost(df: DataFrame) -> None:
    """Human-oriented wrapper around explain_cost."""
    c = explain_cost(df)
    print(
        f"exchanges={c['exchanges']} joins={','.join(c['joins']) or '-'} "
        f"nested_loop={c['has_nested_loop']} python_stages={c['python_stages']} "
        f"codegen_spans={c['codegen_spans']}"
    )
    for i, cols in enumerate(c["scan_columns"]):
        print(f"scan[{i}]: {len(cols)} cols: {', '.join(cols[:8])}"
              + (" …" if len(cols) > 8 else ""))
    for f in c["pushed_filters"]:
        print(f"pushed: {f}")
