"""Declarative data-quality expectations — the constraint layer a
lakehouse ingest runs between "rows arrived" and "rows are facts"
(Delta Live Tables' expect/expect_or_drop/expect_or_fail shape,
re-expressed engine-side; the reference has no analogue — its silver
step drops outliers inline, main/silver.py:78, with no audit trail).

Design for 100 TB:

- ``audit`` computes EVERY rule's violation count in ONE aggregation
  over one scan — rules are boolean columns, so each becomes a
  conditional partial sum; adding a rule adds a counter, never a pass.
- ``enforce`` tags each row with its failed rules (an array column
  built from the same boolean expressions, evaluated narrow) and
  splits pass/quarantine by a filter — two actions over one cached
  lineage, or one pass each when the caller writes both sinks.
- Rules are plain ``Column`` predicates: anything Catalyst can
  evaluate (range checks, regex, IN-lists, cross-column conditions)
  pushes down / codegens like any other filter. NULL predicate
  results count as violations (CHECK-constraint semantics inverted:
  a row passes only if the predicate is definitively TRUE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _holds(rule: Column) -> Column:
    """TRUE iff the rule definitively passes (NULL → violation)."""
    return F.coalesce(rule.cast("boolean"), F.lit(False))


def audit(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, violation_frac).

    Single aggregation — one scan, one reduce of |rules|+1 counters —
    then an in-row stack to long form (no second shuffle; the agg
    output is one row)."""
    if not rules:
        raise ValueError("audit: at least one rule required")
    # violation counters are named by INDEX (identifier-safe no matter
    # what the caller's rule names contain — spaces, quotes, dots);
    # the human-readable name travels as a literal in the struct, so
    # arbitrary names can never reach a SQL parser
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum((~_holds(rule)).cast("long")).alias(f"__v_{i}")
        for i, rule in enumerate(rules.values())
    ]
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{i}").alias("n_violations"),
            )
            for i, name in enumerate(names)
        ]
    )
    return wide.select(
        F.explode(pairs).alias("__p"), F.col("__n").alias("n_rows")
    ).select(
        F.col("__p.rule").alias("rule"),
        "n_rows",
        F.col("__p.n_violations").alias("n_violations"),
        F.round(F.col("__p.n_violations") / F.col("n_rows"), 6).alias(
            "violation_frac"
        ),
    )


def enforce(
    df: DataFrame,
    rules: dict[str, Column],
    mode: str = "drop",
) -> tuple[DataFrame, DataFrame | None]:
    """Apply the rules: returns ``(passed, quarantined)``.

    - ``mode="drop"``: passed = rows satisfying every rule;
      quarantined = None (violations are discarded, DLT expect_or_drop).
    - ``mode="quarantine"``: quarantined = the failing rows, tagged
      with ``_failed_rules array<string>`` naming each violated rule —
      the triage table a steward actually debugs from.

    Both are narrow row-wise filters on the same boolean expressions
    the audit counted — no shuffle; the expressions evaluate once per
    row inside whole-stage codegen."""
    if not rules:
        raise ValueError("enforce: at least one rule required")
    if mode not in ("drop", "quarantine"):
        raise ValueError(f"enforce: unknown mode {mode!r}")
    all_pass = None
    for rule in rules.values():
        ok = _holds(rule)
        all_pass = ok if all_pass is None else (all_pass & ok)
    passed = df.filter(all_pass)
    if mode == "drop":
        return passed, None
    failed_names = F.filter(
        F.array(
            *[
                F.when(~_holds(rule), F.lit(name))
                for name, rule in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    quarantined = df.filter(~all_pass).withColumn("_failed_rules", failed_names)
    return passed, quarantined
