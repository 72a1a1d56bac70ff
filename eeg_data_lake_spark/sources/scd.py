"""Slowly-Changing-Dimension Type 2 maintenance over a transaction-
logged table — the dimension-history pattern every warehouse needs:
instead of overwriting an attribute in place (losing what the world
looked like when old facts were written), each business key keeps a
row per VERSION with a validity interval, and fact queries join
"the dimension as of the fact's timestamp".

Row shape: business key columns + attribute columns +
``_valid_from`` / ``_valid_to`` (NULL = still current) +
``_is_current``. ``scd2_apply`` merges an update batch:

- keys whose attributes actually changed get their current row CLOSED
  (``_valid_to`` = change ts) and a new current row inserted;
- no-op updates (identical attributes) are skipped — the classic
  guard that keeps daily full-snapshot feeds from exploding history;
- brand-new keys insert as current.

Storage: the merge writes through ``TxTable.overwrite`` with a
caller-supplied ``txn_id``, so a replayed batch (foreachBatch retry,
orchestrator re-run) is a no-op, and the txlog's time travel gives a
SECOND recovery axis (the table as of commit N) on top of the
in-row validity intervals. Dimensions are small next to facts — a
full rewrite per batch is the standard SCD2 cost; at huge dimension
scale, partition by a stable key hash and merge only touched
partitions (sources/merge.py shows that path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable

META = ("_valid_from", "_valid_to", "_is_current")


def scd2_init(updates: DataFrame, change_ts: Column) -> DataFrame:
    """First load: every row becomes the current version."""
    return updates.select(
        "*",
        change_ts.alias("_valid_from"),
        F.lit(None).cast("timestamp").alias("_valid_to"),
        F.lit(True).alias("_is_current"),
    )


def scd2_apply(
    table: TxTable,
    updates: DataFrame,
    keys: list[str],
    change_ts: Column,
    txn_id: str | None = None,
) -> int:
    """Merge ``updates`` (one row per business key: key cols + attr
    cols, no meta columns) into the SCD2 table at ``change_ts``.
    Returns the committed version.

    Plan: one join of current rows to the update batch on the business
    key decides changed/unchanged/new; history rows pass through
    untouched; the union overwrites transactionally. The attribute
    comparison is null-safe (NULL -> NULL is unchanged). A batch with
    DUPLICATE business keys is rejected up front (each duplicate would
    fan out the join into two simultaneous current rows, corrupting
    the dimension for every later as-of lookup — same contract as
    merge_into)."""
    dup = updates.groupBy(*keys).count().filter(F.col("count") > 1)
    if dup.limit(1).count():
        raise ValueError(
            "scd2_apply: updates batch has duplicate business keys — "
            "two versions of one key must arrive in two batches"
        )
    if table.version() < 0:
        return table.append(scd2_init(updates, change_ts), txn_id=txn_id)

    snap = table.read()
    attrs = [c for c in updates.columns if c not in keys]
    history = snap.filter(~F.col("_is_current"))
    current = snap.filter(F.col("_is_current"))

    u = updates.select(
        *[F.col(k).alias(f"__u_{k}") for k in keys],
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.lit(True).alias("__u_present"),
    )
    cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"__u_{k}"))
        cond = eq if cond is None else (cond & eq)
    joined = current.join(u, cond, "full_outer")

    same = None
    for a in attrs:
        eq = F.col(a).eqNullSafe(F.col(f"__u_{a}"))
        same = eq if same is None else (same & eq)

    # presence via indicator columns, not key null-checks: the join is
    # null-safe precisely so NULL business keys are legal, and an
    # all-NULL-key update row would otherwise be silently discarded
    in_cur = F.col("_is_current").isNotNull()
    in_upd = F.col("__u_present").isNotNull()

    untouched_or_noop = joined.filter(in_cur & (~in_upd | same)).select(
        snap.columns
    )
    closed = joined.filter(in_cur & in_upd & ~same).select(
        *keys,
        *attrs,
        F.col("_valid_from"),
        change_ts.alias("_valid_to"),
        F.lit(False).alias("_is_current"),
    )
    fresh = joined.filter(in_upd & (~in_cur | ~same)).select(
        *[F.col(f"__u_{k}").alias(k) for k in keys],
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        change_ts.alias("_valid_from"),
        F.lit(None).cast("timestamp").alias("_valid_to"),
        F.lit(True).alias("_is_current"),
    )
    merged = history.unionByName(untouched_or_noop).unionByName(
        closed
    ).unionByName(fresh)
    return table.overwrite(merged, txn_id=txn_id)


def scd2_as_of(dim: DataFrame, ts: Column) -> DataFrame:
    """The dimension as the world looked at ``ts``: rows whose
    validity interval covers the instant (half-open [from, to))."""
    return dim.filter(
        (F.col("_valid_from") <= ts)
        & (F.col("_valid_to").isNull() | (ts < F.col("_valid_to")))
    )
